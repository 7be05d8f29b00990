"""Sinks (SURVEY §2.1 S8-S12).

- ``json_log_sink``   : the structlog-JSON S3 log sink (S10/S11,
  src/function.py:349-364,531-535) as a partitioned JSON-lines write with
  the reference's sanitized timestamp key (D8, :42).
- ``email_digest``    : the email notification sink (S12, :367-401) —
  out of engine scope as delivery, but the digest CONTENT (counts +
  <li> item lists) is an aggregation, computed here as a DataFrame.

Parquet/append/upsert sinks (S6-S9) are first-class engine paths:
``df.write.parquet`` in pipeline.games, MERGE emulation in
queries.core.merge_upsert and streaming.jobs.upsert_outcomes_foreach_batch.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_log_sink(events: DataFrame, out_dir: str, job_name: str) -> str:
    """Write an append-only JSON event log under a sanitized timestamped
    key (the reference's S3 object-key scheme, src/function.py:42,529).

    The key is driver-side metadata, not data — formatted with plain
    ``datetime`` so no Spark job runs for it."""
    key = datetime.now().strftime("%Y-%m-%d_%H-%M-%S") + f"_{job_name}"
    path = os.path.join(out_dir, key)
    events.write.mode("overwrite").json(path)
    return path


def write_sized_parquet(
    df: DataFrame, path: str, target_rows_per_file: int, order_cols: list[str] | None = None
) -> int:
    """Small-files-aware parquet writer: emit ~``target_rows_per_file``
    rows per output file. The small-files problem is the classic 100 TB
    failure mode — a 32-partition job writing a 500-row dim produces 32
    tiny files; a 200-partition shuffle output produces 200.

    Mechanics: one cheap count picks the file count; ``repartition(n)``
    (round-robin, even) or ``repartitionByRange(n, cols)`` (clustered —
    doubles as a sort-by-write for downstream pruning) sets the layout;
    ``maxRecordsPerFile`` caps stragglers. Returns the partition count.
    """
    n = df.count()
    files = max(1, -(-n // target_rows_per_file))
    out = (
        df.repartitionByRange(files, *[F.col(c) for c in order_cols])
        if order_cols
        else df.repartition(files)
    )
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(path)
    )
    return files


def write_partition_overwrite(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent partition-level backfill: with
    ``spark.sql.sources.partitionOverwriteMode=dynamic``, an INSERT
    OVERWRITE replaces ONLY the partitions present in ``df`` and leaves
    every other partition untouched — the reference's
    yesterday's-rows-re-fetch UPDATE pass (src/function.py:462-539)
    becomes "recompute the affected day-partitions and overwrite them",
    the restartable/idempotent form a 100 TB pipeline needs (a re-run of
    the same backfill converges instead of appending duplicates). Static
    mode (the default) would truncate the whole table first — that
    footgun is why the conf is set HERE, scoped to this writer."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_small_files(
    spark, path: str, target_rows_per_file: int, order_cols: list[str] | None = None
) -> int:
    """Table-maintenance compaction (the OPTIMIZE of lakehouse engines):
    read a parquet directory that has accumulated small files (streaming
    micro-batches, per-executor shuffle outputs, incremental appends) and
    rewrite it at the target file size via ``write_sized_parquet``.
    Returns the new file count. Writes to a temp sibling then swaps, so a
    failed compaction never destroys the input."""
    import os
    import shutil

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    files = write_sized_parquet(df, tmp, target_rows_per_file, order_cols)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return files


Z_BITS = 21


def zorder_value(x, y):
    """Morton/Z-value of two non-negative long columns: interleave the low
    {Z_BITS} bits of each. Generated as a flat 42-term sum of
    shift-mask-multiply column expressions — static literals only, fully
    whole-stage-codegen (no higher-order functions, no UDF). 2*{Z_BITS}
    = 42 result bits fits a long exactly."""
    terms = []
    for i in range(Z_BITS):
        terms.append((F.shiftright(x, i).bitwiseAND(F.lit(1))) * F.lit(1 << (2 * i)))
        terms.append(
            (F.shiftright(y, i).bitwiseAND(F.lit(1))) * F.lit(1 << (2 * i + 1))
        )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def write_zorder_parquet(
    df: DataFrame, path: str, col_x: str, col_y: str, num_files: int
) -> None:
    """Z-order-clustered parquet writer (the OPTIMIZE ZORDER BY of table
    formats, as a plain write): rows are range-partitioned AND sorted by
    the interleaved Morton value of (col_x, col_y), so every output
    file's min/max footer stats are narrow in BOTH dimensions — filters
    on either column skip most files at scan time, which linear sorting
    can only deliver for its leading column. At 100 TB this is the
    difference between reading one file and reading the table when the
    query filters on the second dimension.

    Both columns are min/max-normalized to the same {Z_BITS}-bit width
    before interleaving — with raw values, the wider column's high bits
    dominate every range split and the narrow column never clusters (the
    classic Z-order pitfall; one cheap min/max agg fixes it)."""
    bounds = df.agg(
        F.min(F.col(col_x).cast("double")).alias("nx"),
        F.max(F.col(col_x).cast("double")).alias("xx"),
        F.min(F.col(col_y).cast("double")).alias("ny"),
        F.max(F.col(col_y).cast("double")).alias("xy"),
    )
    scale = float((1 << Z_BITS) - 1)

    def norm(c, lo, hi):
        width = F.greatest(F.col(hi) - F.col(lo), F.lit(1.0))
        return F.floor(
            (F.col(c).cast("double") - F.col(lo)) / width * scale
        ).cast("long")

    z = zorder_value(norm(col_x, "nx", "xx"), norm(col_y, "ny", "xy"))
    (
        df.join(F.broadcast(bounds))
        .withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", "nx", "xx", "ny", "xy")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    buckets: int,
    key_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed+sorted parquet table (the co-located-join layout): rows
    are hash-partitioned into ``buckets`` files per partition by
    ``key_cols`` at WRITE time, so a later join or aggregation on those
    keys needs NO shuffle — the scan's output partitioning already
    satisfies the join's requirement. This is the standard answer to the
    "same big join every day" pipeline at 100 TB: pay the shuffle once at
    layout time, amortize it over every downstream query
    (tests/test_plans.py pins the exchange-free plan).

    ``sortBy`` additionally orders within each bucket so sort-merge joins
    skip their sort. Bucketing requires ``saveAsTable`` (the bucket spec
    lives in the catalog, not the parquet footer)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *key_cols)
    w = w.sortBy(*(sort_cols or key_cols))
    w.saveAsTable(table_name)


def email_digest(prepared: DataFrame, updated: DataFrame) -> DataFrame:
    """S12/D10/A5 — the send_email() digest (src/function.py:367-384):
    per-bucket counts + HTML <li> item list, one row per bucket."""

    def digest(df: DataFrame, bucket: str) -> DataFrame:
        li = F.concat(F.lit("<li>"), F.col("game_id").cast("string"), F.lit("</li>"))
        return df.agg(
            F.lit(bucket).alias("bucket"),
            F.count(F.lit(1)).alias("n_games"),
            F.concat_ws("", F.array_sort(F.collect_list(li))).alias("html_items"),
        )

    return digest(prepared, "prepared").unionByName(digest(updated, "updated"))
