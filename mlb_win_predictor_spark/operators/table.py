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

    <path>/v=<N>/part-*.parquet   -- immutable snapshot N
    <path>/_commits/<N>           -- zero-byte marker; N is visible iff present

Invariants (same scheme as ``streaming.jobs._apply_versioned_epoch``):

- Writers write the FULL new snapshot to ``v=N+1`` first, then publish it
  with an atomic marker rename (``os.replace``). A crash anywhere before
  the marker leaves readers on N — no torn reads, ever.
- A retried merge recomputes from N (never from the orphaned N+1 data)
  and overwrites ``v=N+1`` — idempotent, duplicate-free.
- Readers resolve the latest *committed* version at plan time, so a
  long-running read of N is unaffected by N+1 landing mid-query
  (snapshot isolation; parquet files are never mutated in place).
- Single-writer by assumption: two concurrent writers could both target
  N+1. Multi-writer needs a compare-and-swap on the marker (object-store
  conditional put / a lock service) — exactly the piece Delta's
  transaction log adds; documented as out of scope, like SURVEY §7 notes.

Scale: MERGE is one full-outer shuffle join of snapshot x delta on the
merge key — the same plan Delta executes for a full-table merge. For
small deltas the production trim is partition-pruned rewrites; here the
snapshot is rewritten whole, which is the honest baseline and what the
reference's overwrite did too.
"""

from __future__ import annotations

import os
import shutil
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PRESENCE = "_src_present"


class VersionedTable:
    def __init__(self, path: str):
        self.path = path
        self._commits = os.path.join(path, "_commits")

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

    # ---------------------------------------------------------------- reads
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest committed snapshot, or time-travel to ``version``."""
        if version is None:
            version = self.latest_version()
        if version is None or version not in self.committed_versions():
            raise FileNotFoundError(
                f"no committed version {'' if version is None else version} at {self.path}"
            )
        return spark.read.parquet(os.path.join(self.path, f"v={version}"))

    # --------------------------------------------------------------- writes
    def _commit(self, version: int) -> None:
        os.makedirs(self._commits, exist_ok=True)
        tmp = os.path.join(self._commits, f".tmp-{version}")
        with open(tmp, "w"):
            pass
        os.replace(tmp, os.path.join(self._commits, str(version)))

    def init(self, df: DataFrame) -> int:
        """Create version 0 from ``df`` (fails if the table exists)."""
        if self.committed_versions():
            raise FileExistsError(f"table already initialized at {self.path}")
        df.write.mode("overwrite").parquet(os.path.join(self.path, "v=0"))
        self._commit(0)
        return 0

    def merge(
        self, source: DataFrame, keys: list[str], merge_schema: bool = False
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
        pre-evolution version still reads the old schema."""
        spark = source.sparkSession
        base = self.latest_version()
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
        # data first (overwrite clobbers any orphan from a crashed try),
        # marker last: the only publish point.
        merged.write.mode("overwrite").parquet(os.path.join(self.path, f"v={new}"))
        self._commit(new)
        return new

    def delete_where(self, spark: SparkSession, condition) -> int:
        """DELETE FROM ... WHERE: new version without matching rows."""
        base = self.latest_version()
        if base is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        kept = self.read(spark, base).filter(~condition)
        new = base + 1
        kept.write.mode("overwrite").parquet(os.path.join(self.path, f"v={new}"))
        self._commit(new)
        return new

    # ------------------------------------------------------------- cleanup
    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all snapshot dirs except the last ``keep_last`` committed
        versions (crash-orphaned uncommitted dirs included — single-writer,
        so nothing can be mid-flight when vacuum runs). Returns the
        versions removed."""
        committed = self.committed_versions()
        keep = set(committed[-keep_last:]) if keep_last > 0 else set()
        removed = []
        if not os.path.isdir(self.path):
            return removed
        for d in os.listdir(self.path):
            # mirror committed_versions()'s isdigit filter: a stray
            # `v=1.bak` / editor temp dir must not abort the vacuum
            # midway with some snapshots already removed
            if not d.startswith("v=") or not d[2:].isdigit():
                continue
            v = int(d[2:])
            if v in keep:
                continue
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
            marker = os.path.join(self._commits, str(v))
            if os.path.exists(marker):
                os.remove(marker)
            removed.append(v)
        return sorted(removed)
