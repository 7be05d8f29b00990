"""Custom Python Data Source WRITER (Spark 4 Python Data Source API) —
the write-side sibling of ``sources/schedule_source.py``'s reader.

The reference ships JSON logs to S3 with driver-side boto3 put_object
calls (src/function.py:349-364, 529-535) — single-threaded, and a crash
mid-loop leaves a partial prefix readers can't distinguish from a
complete one. This sink makes the object store a first-class
``df.write.format("object_store")`` target with a TWO-PHASE commit:

- each task stages its partition as ``_staged/part-<uuid>.jsonl``
  (speculative / retried task attempts stage DISTINCT uuids and only the
  attempt whose commit message reaches the driver survives);
- the driver's ``commit()`` publishes the surviving objects and then
  writes ``_MANIFEST`` atomically (``os.replace``) naming them — the
  same marker-last protocol as ``operators.table.VersionedTable``;
- ``abort()`` discards the staging area; no manifest, no visibility.

Readers resolve through the manifest (``read_manifest_objects``), so a
failed or in-flight job is invisible. A local directory stands in for
the bucket here; against real S3 the staging prefix + copy-on-commit
mechanics are identical (multipart upload finalization plays the
``os.replace`` role).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class ObjectCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class ObjectStoreWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("object_store sink requires a save path")
        # test hook: injected task failure exercises the abort path
        self.inject_fail = str(options.get("inject_fail", "")).lower() == "true"
        self.overwrite = overwrite

    def write(self, iterator):
        if self.inject_fail:
            raise RuntimeError("object_store: injected task failure")
        staged = os.path.join(self.path, "_staged")
        os.makedirs(staged, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staged, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
                n += 1
        return ObjectCommit(filename=name, n_rows=n)

    def commit(self, messages):
        # mode semantics resolve at commit time, against the PREVIOUS
        # manifest: append merges its object list into the new one (a
        # second append must not orphan earlier committed objects —
        # readers resolve ONLY through the manifest); overwrite deletes
        # the previously published objects before the new manifest lands.
        prior = []
        manifest = os.path.join(self.path, "_MANIFEST")
        if os.path.exists(manifest):
            with open(manifest) as f:
                prior = json.load(f)["objects"]
        published = [] if self.overwrite else list(prior)
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, "_staged", m.filename),
                os.path.join(self.path, m.filename),
            )
            published.append({"object": m.filename, "rows": m.n_rows})
        shutil.rmtree(os.path.join(self.path, "_staged"), ignore_errors=True)
        tmp = os.path.join(self.path, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump({"objects": published}, f)
        os.replace(tmp, manifest)
        if self.overwrite:
            # reclaim the replaced objects AFTER the new manifest lands —
            # deleting first would let a reader of the old manifest see
            # dangling paths while the commit is still in flight
            keep = {o["object"] for o in published}
            for o in prior:
                if o["object"] not in keep:
                    with contextlib.suppress(FileNotFoundError):
                        os.remove(os.path.join(self.path, o["object"]))

    def abort(self, messages):
        shutil.rmtree(os.path.join(self.path, "_staged"), ignore_errors=True)


class ObjectStoreStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: one epoch = one ``batch=<id>/`` object prefix +
    one commit marker. ``commit(messages, batchId)`` REPLACES the epoch's
    prefix before publishing, so a replayed epoch (at-least-once
    foreachBatch-style delivery) overwrites its own output instead of
    appending duplicates — the same versioned-epoch idempotence the
    engine's foreachBatch sinks use (``streaming.jobs``)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("object_store sink requires a save path")

    def write(self, iterator):
        staged = os.path.join(self.path, "_staged")
        os.makedirs(staged, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staged, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
                n += 1
        return ObjectCommit(filename=name, n_rows=n)

    def commit(self, messages, batchId: int):
        bdir = os.path.join(self.path, f"batch={batchId}")
        # replay ordering: retract the epoch's commit marker FIRST, so a
        # reader resolving through read_committed_stream_batches treats
        # the epoch as uncommitted while its objects are being replaced —
        # clearing the dir with the old marker still up would hand
        # readers dangling object paths (marker present, files gone)
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(self.path, "_commits", str(batchId)))
        shutil.rmtree(bdir, ignore_errors=True)
        os.makedirs(bdir, exist_ok=True)
        published = []
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, "_staged", m.filename),
                os.path.join(bdir, m.filename),
            )
            published.append({"object": m.filename, "rows": m.n_rows})
        commits = os.path.join(self.path, "_commits")
        os.makedirs(commits, exist_ok=True)
        tmp = os.path.join(commits, f".tmp-{batchId}")
        with open(tmp, "w") as f:
            json.dump({"batch": batchId, "objects": published}, f)
        os.replace(tmp, os.path.join(commits, str(batchId)))

    def abort(self, messages, batchId: int):
        # epochs run serially, so the whole staging area belongs to the
        # aborted epoch — including files from tasks that died before
        # returning a commit message
        shutil.rmtree(os.path.join(self.path, "_staged"), ignore_errors=True)


class ObjectStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "object_store"

    def writer(self, schema, overwrite: bool) -> ObjectStoreWriter:
        return ObjectStoreWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> ObjectStoreStreamWriter:
        return ObjectStoreStreamWriter(self.options)


def register_object_store_sink(spark) -> None:
    spark.dataSource.register(ObjectStoreDataSource)


def read_manifest_objects(path: str) -> list[dict]:
    """Committed objects per the manifest — the ONLY read contract."""
    with open(os.path.join(path, "_MANIFEST")) as f:
        return json.load(f)["objects"]


def read_committed_stream_batches(path: str) -> dict[int, list[dict]]:
    """Streaming read contract: committed epochs only (marker present);
    an in-flight or crashed epoch's ``batch=`` dir is invisible."""
    commits = os.path.join(path, "_commits")
    if not os.path.isdir(commits):
        return {}
    out = {}
    for m in os.listdir(commits):
        if m.isdigit():
            with open(os.path.join(commits, m)) as f:
                out[int(m)] = json.load(f)["objects"]
    return out
