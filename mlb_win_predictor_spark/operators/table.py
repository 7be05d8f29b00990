"""Versioned parquet table with transactional MERGE (SURVEY §2.2 S9 at
production semantics).

``queries.core.merge_upsert`` computes the MERGE *result*; the reference
(src/function.py:480-513) then overwrites its SQL table in place — fine
behind a transactional store, unsafe on plain parquet where a reader can
observe a half-written overwrite. Delta/Iceberg are the managed answer;
this module is the engine-native one: the snapshot-versioning commit
protocol those formats use, reduced to its core and built on nothing but
parquet directories.

Layout::

    <path>/v=<N>-<pid>-<k>/part-*.parquet -- immutable snapshot data (unique name)
    <path>/_commits/<N>                   -- marker; content = the data dir's
                                             basename; N is visible iff present
    (legacy tables: empty marker content resolves to plain ``v=<N>``)

Invariants (same scheme as ``streaming.jobs._apply_versioned_epoch``):

- Writers write the FULL new snapshot first, then publish it with one
  exclusive-create of the marker. A crash anywhere before the marker
  leaves readers on N — no torn reads, ever.
- A retried merge recomputes from N (never from orphaned data) into a
  fresh uniquely-named dir — idempotent, duplicate-free.
- Readers resolve the latest *committed* version at plan time and reach
  the data THROUGH the marker's pointer, so a long-running read of N is
  unaffected by N+1 landing mid-query (snapshot isolation; parquet
  files are never mutated in place).
- **Optimistic concurrency** (the piece Delta's transaction log adds,
  reduced to a filesystem CAS): every snapshot dir is uniquely named —
  writers NEVER contend on a rename target — and the marker, created
  with ``open(..., "x")`` and holding the winning dir's name, is the
  single commit point (Delta's log entry as a pointer file). A writer
  that raced a competing commit for the same version gets
  ``ConcurrentCommitError`` (retryable: re-read the NEW snapshot,
  recompute, commit N+2) and removes only its OWN data. A crashed
  writer leaves an unreferenced dir that ``vacuum`` sweeps; nothing in
  the publish path ever deletes another writer's files (the earlier
  shared-``v=N``-rename design had a lost-update window where a live
  loser could reclaim the winner's just-renamed data — designed out,
  regression-tested in test_publish_interleaving_cannot_lose_winner_data).
  On an object store the marker maps to conditional put, which is
  exactly where this lands at 100 TB.

Scale: MERGE is one full-outer shuffle join of snapshot x delta on the
merge key — the same plan Delta executes for a full-table merge. For
small deltas the production trim is partition-pruned rewrites; here the
snapshot is rewritten whole, which is the honest baseline and what the
reference's overwrite did too.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PRESENCE = "_src_present"

ZONEMAP = "_zonemap.json"
# zone-map stats are collected for these leaf types only (min/max is
# well-ordered and JSON-portable); everything else is unprunable
_ZONEMAP_TYPES = ("int", "bigint", "smallint", "tinyint", "double", "float", "string")

_ATTEMPT_COUNTER = itertools.count()


class ConcurrentCommitError(RuntimeError):
    """A competing writer committed this version first. Retryable: re-read
    the latest snapshot, recompute the merge, and commit the next version."""


class VersionedTable:
    def __init__(self, path: str):
        self.path = path
        self._commits = os.path.join(path, "_commits")
        self._staging = os.path.join(path, "_staged")

    # ------------------------------------------------------------- metadata
    def committed_versions(self) -> list[int]:
        if not os.path.isdir(self._commits):
            return []
        return sorted(
            int(m) for m in os.listdir(self._commits) if m.isdigit()
        )

    def latest_version(self) -> int | None:
        vs = self.committed_versions()
        return vs[-1] if vs else None

    def _snapshot_dir(self, version: int) -> str:
        """Resolve a committed version's data dir THROUGH its marker
        (marker content = dir basename); an empty marker is the legacy
        layout where the dir is plain ``v=<N>``."""
        marker = os.path.join(self._commits, str(version))
        with open(marker) as fh:
            name = fh.read().strip()
        return os.path.join(self.path, name or f"v={version}")

    # ---------------------------------------------------------------- reads
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest committed snapshot, or time-travel to ``version``."""
        if version is None:
            version = self.latest_version()
        if version is None or version not in self.committed_versions():
            raise FileNotFoundError(
                f"no committed version {'' if version is None else version} at {self.path}"
            )
        return spark.read.parquet(self._snapshot_dir(version))

    # ----------------------------------------------------- zone-map skipping
    def _write_zonemap(self, spark: SparkSession, staged: str) -> None:
        """Collect per-file min/max column stats for the staged snapshot
        and store them INSIDE the staged dir (``_zonemap.json`` — the
        leading underscore keeps Spark's parquet reader from touching
        it), so the manifest becomes visible atomically with the
        snapshot rename: Delta's per-file ``stats`` field, reduced to a
        sidecar. One extra scan of the staged data, aggregated per file
        (#files × #cols rows to the driver — at real scale the manifest
        lives as a metadata TABLE, not driver JSON; same bounded-state
        caveat as Delta's checkpoint parquet)."""
        df = spark.read.parquet(staged)
        cols = [f.name for f in df.schema.fields if f.dataType.simpleString() in _ZONEMAP_TYPES]
        if not cols:
            return
        aggs = []
        for c in cols:
            aggs.append(F.min(c).alias(f"min__{c}"))
            aggs.append(F.max(c).alias(f"max__{c}"))
        rows = (
            df.withColumn("_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
            .groupBy("_file")
            .agg(*aggs)
            .collect()
        )
        manifest = {
            r["_file"]: {c: [r[f"min__{c}"], r[f"max__{c}"]] for c in cols}
            for r in rows
        }
        with open(os.path.join(staged, ZONEMAP), "w") as fh:
            json.dump({"columns": cols, "files": manifest}, fh)

    def pruned_files(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> tuple[list[str], int]:
        """(files overlapping [lo, hi] on ``col``, total file count) from
        the version's zone-map. Files without stats for ``col`` are kept
        (skipping must never change results). ``None`` bounds are open."""
        if version is None:
            version = self.latest_version()
        vdir = self._snapshot_dir(version)
        zm_path = os.path.join(vdir, ZONEMAP)
        names = [f for f in os.listdir(vdir) if f.endswith(".parquet")]
        if not os.path.exists(zm_path):
            return names, len(names)
        with open(zm_path) as fh:
            zm = json.load(fh)
        kept = []
        for f in names:
            stats = zm["files"].get(f, {}).get(col)
            if not stats or stats[0] is None:
                kept.append(f)
                continue
            mn, mx = stats
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                continue
            kept.append(f)
        return kept, len(names)

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> DataFrame:
        """Range read with Delta-style data skipping: consult the
        per-file min/max zone-map, plan the scan over only the files
        whose [min, max] can overlap [lo, hi], and apply the exact
        filter on top (the zone-map prunes, the filter decides) —
        results are identical to ``read().filter(...)`` by construction.
        At 100 TB this is the difference between listing 1M files and
        scanning the 30 that a time-range query touches."""
        if version is None:
            version = self.latest_version()
        files, _total = self.pruned_files(col, lo, hi, version)
        vdir = self._snapshot_dir(version)
        if files:
            df = spark.read.parquet(*(os.path.join(vdir, f) for f in files))
        else:
            schema = spark.read.parquet(vdir).schema
            df = spark.createDataFrame([], schema)
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    # --------------------------------------------------------------- writes
    def _stage_dir(self, version: int) -> str:
        """Unique per-attempt staging dir: concurrent writers never write
        into the same directory, so a losing attempt can't corrupt the
        winner's published data (the reason Delta writes uniquely-named
        data files before its log CAS). The basename survives publish
        (the marker points at it), so it carries the ``v=`` prefix. A
        uuid fragment makes the name unique across PROCESS LIFETIMES
        too: pid + counter alone could collide with a crashed writer's
        not-yet-vacuumed orphan after pid recycling, turning the
        "never contended" rename into an ENOTEMPTY surprise."""
        import uuid

        return os.path.join(
            self._staging,
            f"v={version}-{os.getpid()}-{next(_ATTEMPT_COUNTER)}-{uuid.uuid4().hex[:8]}",
        )

    def _publish(self, staged: str, version: int) -> int:
        """Atomically publish a fully-staged snapshot as ``version``.

        Marker-as-pointer CAS (the Delta log entry reduced to a file):
        the snapshot keeps a UNIQUE dir name (``v=<N>-<pid>-<attempt>``,
        renamed from staging — never contended), and the marker file —
        created with O_EXCL (``open "x"``), exactly one winner — holds
        that dir's basename. Readers resolve the data dir THROUGH the
        marker, so there is no shared ``v=N`` rename to race on: an
        earlier design renamed everyone onto ``v=N`` and reclaimed
        "orphans", which let a live loser rmtree the winner's
        just-renamed data before the winner's marker landed (lost
        update). Now a loser only ever removes its own dir; a crashed
        writer leaves an unreferenced dir that ``vacuum`` sweeps."""
        final = os.path.join(self.path, os.path.basename(staged))
        marker = os.path.join(self._commits, str(version))

        def _lose(msg: str) -> ConcurrentCommitError:
            shutil.rmtree(staged, ignore_errors=True)
            shutil.rmtree(final, ignore_errors=True)
            return ConcurrentCommitError(
                f"version {version} at {self.path}: {msg}; re-read the new "
                "snapshot and retry the merge"
            )

        if os.path.exists(marker):
            raise _lose("a competing writer committed first")
        os.rename(staged, final)  # uuid-unique target: never contended
        os.makedirs(self._commits, exist_ok=True)
        # the marker must appear WITH its pointer content atomically: an
        # open("x") + write would expose (reader race) or persist (crash
        # between create and close) an empty marker that mis-resolves to
        # the legacy v=N dir. So the content is written to a private tmp
        # file first and os.link() publishes it — link is the CAS (fails
        # EEXIST if a competitor won) and the marker is born non-empty.
        tmp = f"{marker}.{os.path.basename(final)}.tmp"
        with open(tmp, "w") as fh:
            fh.write(os.path.basename(final))
        try:
            os.link(tmp, marker)
        except FileExistsError:
            raise _lose("a competing writer committed first")
        finally:
            os.unlink(tmp)
        return version

    def init(self, df: DataFrame) -> int:
        """Create version 0 from ``df`` (fails if the table exists)."""
        if self.committed_versions():
            raise FileExistsError(f"table already initialized at {self.path}")
        staged = self._stage_dir(0)
        df.write.mode("overwrite").parquet(staged)
        self._write_zonemap(df.sparkSession, staged)
        try:
            self._publish(staged, 0)
        except ConcurrentCommitError:
            raise FileExistsError(f"table already initialized at {self.path}")
        return 0

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        merge_schema: bool = False,
        expected_base: int | None = None,
    ) -> int:
        """MERGE INTO: rows matching on ``keys`` are replaced by the
        source row (WHEN MATCHED THEN UPDATE SET *), unmatched source
        rows are appended (WHEN NOT MATCHED THEN INSERT *). Returns the
        new committed version.

        Standard MERGE errors when a target row matches MULTIPLE source
        rows (the full-outer join would silently fan the target row out —
        a dup-keyed CDC delta would corrupt the table invisibly), so
        source key-uniqueness is validated first: one hash agg over the
        DELTA only (the small side), never the snapshot.

        ``merge_schema=True`` is Delta's ``mergeSchema`` evolution: source
        columns absent from the target are appended to the snapshot
        schema (nullable); target columns absent from the source keep
        their value on matched/unmatched rows and are null on inserts.
        Old snapshots are immutable files, so time-travel to a
        pre-evolution version still reads the old schema.

        ``expected_base`` pins the snapshot this delta was computed
        against (Delta's read-version in its conflict check): if another
        writer committed in between, the merge raises
        ``ConcurrentCommitError`` BEFORE writing anything, and the caller
        retries against the new snapshot. Without it the merge targets
        whatever is latest at call time, and only the publish-time marker
        CAS guards the same-version race."""
        spark = source.sparkSession
        base = self.latest_version()
        if expected_base is not None and base != expected_base:
            raise ConcurrentCommitError(
                f"snapshot moved: expected base {expected_base}, latest is "
                f"{base} at {self.path}; re-read the new snapshot and retry"
            )
        if base is None:
            return self.init(source)
        target = self.read(spark, base)
        s_cols, t_cols = source.columns, target.columns
        if missing := [k for k in keys if k not in s_cols]:
            raise ValueError(f"merge keys absent from source: {missing}")
        if merge_schema:
            new_cols = [c for c in s_cols if c not in t_cols]
        else:
            new_cols = []
            if set(s_cols) != set(t_cols):
                raise ValueError(
                    f"schema mismatch: target {sorted(t_cols)} vs "
                    f"source {sorted(s_cols)} (pass merge_schema=True to evolve)"
                )
        dup = (
            source.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .take(1)
        )
        if dup:
            raise ValueError(
                f"MERGE source has duplicate rows per key {keys} "
                f"(e.g. {tuple(dup[0][k] for k in keys)}); dedup the delta "
                "first (last-wins policy is the caller's call, not ours)"
            )
        t = target.alias("t")
        s = source.withColumn(PRESENCE, F.lit(1)).alias("s")
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
        )
        matched = F.col(f"s.{PRESENCE}").isNotNull()
        merged = t.join(s, cond, "full_outer").select(
            *[F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys],
            *[
                (
                    F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
                    if c in s_cols
                    else F.col(f"t.{c}")  # evolution: source dropped it — keep
                ).alias(c)
                for c in t_cols
                if c not in keys
            ],
            # evolution: brand-new columns — null wherever the source row
            # is absent (unmatched target rows), by full-outer construction
            *[F.col(f"s.{c}").alias(c) for c in new_cols],
        )
        new = base + 1
        # data first into a UNIQUE staging dir, then CAS-publish: the only
        # publish point is the exclusive marker create; a competing commit
        # of the same version raises ConcurrentCommitError (retryable).
        staged = self._stage_dir(new)
        merged.write.mode("overwrite").parquet(staged)
        self._write_zonemap(spark, staged)
        return self._publish(staged, new)

    def delete_where(self, spark: SparkSession, condition) -> int:
        """DELETE FROM ... WHERE: new version without matching rows."""
        base = self.latest_version()
        if base is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        kept = self.read(spark, base).filter(~condition)
        new = base + 1
        staged = self._stage_dir(new)
        kept.write.mode("overwrite").parquet(staged)
        self._write_zonemap(spark, staged)
        return self._publish(staged, new)

    # ------------------------------------------------------------- cleanup
    def vacuum(self, keep_last: int = 2, staging_ttl_s: float = 3600.0) -> list[int]:
        """Drop every snapshot dir not referenced by one of the last
        ``keep_last`` committed markers — which sweeps both old versions
        and crash-orphaned unreferenced dirs — plus ``_staged/`` attempt
        dirs OLDER than ``staging_ttl_s`` (a retention window, Delta
        VACUUM style: a live writer's in-flight staging is younger than
        the TTL and survives; the earlier delete-all behavior could
        destroy a concurrent writer's staging mid-merge). A referenced
        dir name is read from the marker content (legacy empty markers
        reference ``v=<N>``). Returns the versions whose markers were
        dropped; unreferenced orphan dirs are removed silently.

        ``staging_ttl_s`` CONTRACT (Delta's retention-vs-transaction
        rule, LOG.md "Data retention" in delta-io): it must exceed the
        maximum stage-to-commit latency of any live writer — the time
        from a writer's first staged parquet byte (or its post-rename
        unreferenced ``v=*`` dir) to its marker landing. The liveness
        heuristic is the dir's top-level mtime, so a writer that stalls
        longer than the TTL between finishing its parquet write and
        linking its marker (GC pause, slow zone-map scan) can have its
        dir swept and would then commit a marker pointing at deleted
        data. The 1h default dwarfs any realistic single-commit latency;
        lower it only in tests or pair it with an external writer fence.
        Stale ``_commits/*.tmp`` pointer files (leaked when a writer
        crashes between writing the tmp and the finally-unlink in
        ``_publish``) are swept past the same TTL — they are never
        referenced by readers but would otherwise accumulate forever."""
        import time

        committed = self.committed_versions()
        keep_versions = set(committed[-keep_last:]) if keep_last > 0 else set()
        removed = []
        if not os.path.isdir(self.path):
            return removed
        # staging sweep, TTL-guarded
        if os.path.isdir(self._staging):
            now = time.time()
            for d in os.listdir(self._staging):
                sd = os.path.join(self._staging, d)
                try:
                    age = now - os.path.getmtime(sd)
                except OSError:
                    continue
                if age > staging_ttl_s:
                    shutil.rmtree(sd, ignore_errors=True)
        # crashed-writer tmp pointer files in _commits (written by
        # _publish before os.link; leaked if the process dies between
        # the write and the finally-unlink). committed_versions ignores
        # them, so this is hygiene, not correctness — but TTL-guarded
        # anyway: a live writer's tmp exists only for the microseconds
        # around its link call.
        if os.path.isdir(self._commits):
            now = time.time()
            for name in os.listdir(self._commits):
                if not name.endswith(".tmp"):
                    continue
                tmp = os.path.join(self._commits, name)
                try:
                    if now - os.path.getmtime(tmp) > staging_ttl_s:
                        os.remove(tmp)
                except OSError:
                    continue
        # referenced dirs of kept versions. A marker-read failure here
        # must ABORT (not fall through): treating an unreadable KEPT
        # marker as no-reference would sweep live committed data.
        keep_dirs = set()
        for v in keep_versions:
            keep_dirs.add(os.path.basename(self._snapshot_dir(v)))
        # resolve the data dirs of versions being DROPPED before their
        # markers disappear — those sweep unconditionally (the marker is
        # gone, no live writer can own them)
        drop_dirs = set()
        for v in committed:
            if v in keep_versions:
                continue
            try:
                drop_dirs.add(os.path.basename(self._snapshot_dir(v)))
            except OSError:
                pass  # unreadable unkept marker: its dir falls to the TTL path
            marker = os.path.join(self._commits, str(v))
            if os.path.exists(marker):
                os.remove(marker)
            removed.append(v)
        # sweep the rest of the unreferenced v=* dirs (crashed-writer
        # orphans) only past the retention TTL: a FRESH unreferenced dir
        # can be a live writer inside the rename→marker window of
        # _publish, and sweeping it would let that writer commit a
        # marker pointing at deleted data.
        now = time.time()
        for d in os.listdir(self.path):
            if not d.startswith("v=") or d in keep_dirs:
                continue
            full = os.path.join(self.path, d)
            if d in drop_dirs:
                shutil.rmtree(full, ignore_errors=True)
                continue
            try:
                if now - os.path.getmtime(full) <= staging_ttl_s:
                    continue
            except OSError:
                continue
            shutil.rmtree(full, ignore_errors=True)
        return sorted(removed)
