"""Distributed dense row indexing (surrogate-key assignment).

The naive formulation — ``row_number() OVER (ORDER BY ...)`` with no
partition key — collapses the whole dataset into ONE partition (Spark
warns `No Partition Defined for Window operation`); at 100 TB that is a
single-task sort of the universe. This operator produces the identical
0..n-1 dense index with no single-partition stage:

1. range-partition (and locally sort) by the order columns — a real
   shuffle but a parallel one (or keep existing partitioning when
   ``order_cols=None`` for an arbitrary-but-stable dense id);
2. per-partition ``row_number`` (sort is partition-local);
3. per-partition counts → cumulative offsets (a driver-side list of
   num_partitions integers — the only driver data);
4. index = partition offset + local row_number − 1 via a broadcast join.

Step 1's output is pinned with a ``localCheckpoint`` before the offsets
collect (r9 verdict #1): the offsets job and the returned lazy plan are
two separate executions, and ``RangePartitioner`` samples its boundaries
per job — at lossy-sampling scale the two jobs could land rows in
different partitions, silently applying offsets to a partitioning they
weren't computed from. The checkpoint materializes ONE physical
partitioning that both jobs read. A ``persist()`` would NOT suffice: a
cache is a hint, and an evicted block is silently re-computed through a
fresh (re-sampled) shuffle — the exact hazard — whereas a lost
checkpoint block fails loudly. Release is the terminal-action owner's
job via ``session.release_caches`` (the PPJoin/CCNet/RFM cache-lifetime
contract, r6 verdict #2).

r13 (r12 verdict #7 — the per-dimension floor): the checkpoint is now
LAZY (``eager=False``) and the offsets collect is the materializing
action, so each ranked dimension pays ONE job (compute + store blocks +
count in-line) instead of two (materialize, then re-read the blocks to
count). The pinning guarantee is unchanged — the collect stores the
blocks it computes, and the returned plan reads those same blocks; a
lost block still fails loudly. The collect itself stays driver-side on
purpose: it moves num_partitions scalars, and the alternative (a
distributed prefix-sum subtree) just relocates the same barrier into a
BroadcastExchange build job — same job count, more plan.

The ``order_cols`` variant is deterministic and SQL-expressible
(``ROW_NUMBER() OVER (ORDER BY ...) − 1``), so it is DuckDB-oracle
checked; the plan-shape test pins that no SinglePartition exchange
appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _ranged(df: DataFrame, order_cols: list[str] | None) -> DataFrame:
    """The PRE-checkpoint frame: range-partitioned (when ordered) and
    tagged with the physical partition id. Factored out so the plan-
    shape tests can still pin the internal shape (parallel range
    exchange, never a SinglePartition collapse) — the eager checkpoint
    in the public operators hides everything below it from the
    consumer's explain()."""
    base = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        if order_cols
        else df
    )
    return base.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )


def _indexed_with_total(
    df: DataFrame,
    order_cols: list[str] | None,
    id_name: str,
) -> tuple[DataFrame, int]:
    """Shared body of ``dense_global_index``/``exact_ntile``: the indexed
    frame plus the TOTAL row count, which falls out of the same offsets
    collect — callers that need n (exact NTILE arithmetic) get it with
    no extra count() scan of their input."""
    if order_cols:
        w = W.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    else:
        w = W.partitionBy("_pid").orderBy(F.col("_mid").asc())

    # LAZY checkpoint (r13): the counts collect below is the action that
    # materializes the blocks — one job per dimension, not two.
    part = _ranged(df, order_cols).localCheckpoint(eager=False)
    counts = sorted(
        (r._pid, r.n)
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )
    indexed = (
        part.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_name, (F.col("_offset") + F.col("_rn") - 1).cast("long"))
    )
    return indexed.drop("_pid", "_mid", "_rn", "_offset"), acc


def dense_global_index(
    df: DataFrame,
    order_cols: list[str] | None = None,
    id_name: str = "row_idx",
) -> DataFrame:
    """Assign a dense 0..n-1 ``id_name`` column. With ``order_cols`` the
    index follows that total order (make it unique for determinism);
    without, the order is the incoming partition order (stable within a
    run, not across layouts)."""
    indexed, _ = _indexed_with_total(df, order_cols, id_name)
    return indexed


def exact_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int | None,
    k: int,
    name: str,
) -> DataFrame:
    """Exact NTILE(k) bucket (1-based) over a total order, built on the
    range-partitioned ``dense_global_index`` — never a one-task global
    sort. NTILE(k) over n rows puts q+1 rows in each of the first r
    buckets and q in the rest (q, r = divmod(n, k)); note floor(idx*k/n)
    is NOT the same split when k does not divide n. ``n`` is the
    caller's row count; pass ``None`` (r13) to derive it from the
    operator's own offsets collect — zero extra scans, same value."""
    indexed, total = _indexed_with_total(df, order_cols, id_name="_ntile_idx")
    if n is None:
        n = total
    elif n != total:
        raise ValueError(
            f"exact_ntile: caller-supplied n={n} != actual row count "
            f"{total} — the bucket arithmetic would be silently wrong"
        )
    q, r = divmod(n, k)
    idx = F.col("_ntile_idx")
    if q == 0:  # fewer rows than buckets: everyone lands in bucket idx+1
        b = idx + 1
    else:
        head = r * (q + 1)  # rows covered by the first r (larger) buckets
        b = F.when(idx < head, F.floor(idx / (q + 1)) + 1).otherwise(
            r + F.floor((idx - head) / q) + 1
        )
    return indexed.withColumn(name, b.cast("int")).drop("_ntile_idx")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    name: str = "running_sum",
) -> DataFrame:
    """Distributed PREFIX SUM of ``value_col`` over a total order — the
    running-total dual of ``dense_global_index``, with the same
    no-single-partition discipline: a global
    ``SUM(...) OVER (ORDER BY ...)`` window collapses the dataset into
    one task; this instead range-partitions by the order columns, sums
    locally (partition-local sort), and shifts each partition by the
    driver-side prefix of per-partition totals (num_partitions scalars —
    the only driver data). The range-partitioned frame is pinned with an
    eager ``localCheckpoint`` before the totals collect so the offsets
    job and the returned plan read ONE physical partitioning (see module
    docstring). INTEGER value columns only — the partition offsets are
    accumulated as exact Python ints and the result is a ``long``; a
    float column would be silently int-truncated, so it is rejected
    loudly here instead."""
    kind = dict(df.dtypes).get(value_col, "")
    if kind not in {"tinyint", "smallint", "int", "bigint"}:
        raise TypeError(
            f"global_running_sum needs an integral value column; "
            f"{value_col!r} is {kind or 'missing'} — exact driver-side "
            f"offsets (and the long result) would truncate floats "
            f"(cast booleans to int first; Spark cannot SUM a boolean)"
        )
    # LAZY checkpoint (r13, same as _indexed_with_total): the totals
    # collect below materializes the blocks in the same job.
    part = _ranged(df, order_cols).drop("_mid").localCheckpoint(eager=False)
    w = (
        W.partitionBy("_pid")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    totals = sorted(
        (r._pid, r.s)
        for r in part.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    )
    offsets, acc = [], 0
    for pid, s in totals:
        offsets.append((int(pid), int(acc)))
        acc += int(s or 0)
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    return (
        part.withColumn("_lc", F.sum(value_col).over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(name, (F.col("_offset") + F.col("_lc")).cast("long"))
        .drop("_pid", "_lc", "_offset")
    )
