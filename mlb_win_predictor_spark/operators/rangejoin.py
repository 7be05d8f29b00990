"""Bucketed interval-overlap join — the large×large range join Spark
does not optimize natively.

A non-equi overlap predicate (``a.start <= b.end AND b.start <= a.end``)
between two LARGE tables gives Catalyst nothing to hash on: the physical
plan degrades to BroadcastNestedLoopJoin (only legal when one side fits
in memory) or a cartesian product — both non-starters at 100 TB. The
classic fix (Databricks' range-join optimization, DuckDB's IEJoin) is to
**bucketize the value domain**: explode each interval into the fixed-width
buckets it covers, equi-join on the bucket id (an ordinary hash shuffle,
fully parallel, AQE-skew-splittable), then re-check the exact predicate.

Duplicate suppression is the subtle part: a pair whose overlap spans k
shared buckets would match k times. Instead of a distinct (a second
shuffle over the *output*, which can be far larger than either input),
each pair is emitted only in its CANONICAL bucket — the bucket containing
``greatest(a.start, b.start)``, the overlap's left endpoint, which both
sides agree on. One shuffle total, output exactly once per matching pair.

Bucket width trades replication (intervals span ``len/W + 1`` buckets)
against candidate density (wider buckets → more false candidates per
bucket); set it near the typical interval length so replication stays
O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner join of ``left`` × ``right`` on interval overlap
    (``l_start <= r_end AND r_start <= l_end``, closed intervals over an
    integer domain), executed as a bucket equi-join. Returns the joined
    rows (left columns then right columns); each matching pair appears
    exactly once. Column names must be disjoint across the two inputs
    (rename/alias before a self-join). ``extra_cond`` adds a post-filter
    (e.g. key inequality for self-joins)."""
    w = int(bucket_width)
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(l_start) / w).cast("long"),
                F.floor(F.col(l_end) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(r_start) / w).cast("long"),
                F.floor(F.col(r_end) / w).cast("long"),
            )
        ),
    )
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    canonical = F.col("_bucket") == F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / w
    ).cast("long")
    joined = lb.join(rb, "_bucket").where(overlap & canonical)
    if extra_cond is not None:
        joined = joined.where(extra_cond)
    return joined.drop("_bucket")
