"""Count-min sketch as a plain DataFrame — a mergeable frequency sketch.

Complements the native Datasketches entries (HLL / theta / KLL in
``queries.extra``) with the one sketch family Spark has no readable
built-in for: point-frequency estimation. The sketch IS a DataFrame of
``(seed, bucket, n)`` rows (at most ``depth * width`` of them), so it

- builds with one map-side-combinable hash aggregation over the keys,
- merges across partitions/days by ``union`` + re-aggregation (never
  rescanning the fact table), and
- serves point lookups with a broadcast join of the probe keys.

Guarantee (Cormode & Muthukrishnan 2005): estimates never undercount, and
overcount by more than ``2N/width`` with probability ≤ 2^-depth per key.

Reference tie-in: the reference has no sketches at all (its scale is 2k
rows, SURVEY.md §6); this is 100 TB engine surface mandated by the
north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 512


def _bucket(width: int, hash: str):
    """Row→bucket expression factory for one of the ``depth`` hash rows.

    ``xxhash64`` (default): JVM-native, the fast path for a corpus-scale
    build. ``md5``: the repo's engine-portable md5-conv integer hash
    (first 8 hex digits as an int) over ``"<seed>:<key>"`` — ~4× more
    per-row CPU, but the WHOLE sketch (cells, counts, estimates) becomes
    bit-reproducible on any engine that has md5, which is what lets a
    downstream system re-derive and VERIFY streamed counts (and what
    promotes the catalog entry to a full DuckDB oracle). Both are
    uniform enough for the CMS guarantee; pick per workload."""
    if hash == "xxhash64":
        return lambda: F.pmod(F.xxhash64("k", "seed"), F.lit(width))
    if hash == "md5":
        from ..functions.scalars import md5_int32

        h = md5_int32(
            F.concat(
                F.col("seed").cast("string"), F.lit(":"), F.col("k").cast("string")
            )
        )
        return lambda: F.pmod(h, F.lit(width))
    raise ValueError(f"unknown cms hash family {hash!r}")


def cms_build(
    df: DataFrame,
    key: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    hash: str = "xxhash64",
) -> DataFrame:
    """One pass: each row lands in ``depth`` (seed, bucket) cells; the
    groupBy is map-side combinable so the shuffle carries at most
    ``depth * width`` rows per partition regardless of input size."""
    seeds = F.explode(F.array(*[F.lit(s) for s in range(depth)])).alias("seed")
    cells = df.select(F.col(key).alias("k"), seeds).select(
        "seed", _bucket(width, hash)().alias("bucket")
    )
    return cells.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("n"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union-mergeable: cell-wise sum. Sketches from different days /
    partitions / clusters combine without touching the source data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    hash: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates for the probe keys: min over the key's
    ``depth`` cells (must use the SAME hash family the sketch was built
    with). The sketch is tiny (≤ depth*width rows) → broadcast; missing
    cells count 0."""
    seeds = F.explode(F.array(*[F.lit(s) for s in range(depth)])).alias("seed")
    cells = probes.select(F.col(key).alias("k"), seeds).select(
        "k", "seed", _bucket(width, hash)().alias("bucket")
    )
    return (
        cells.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count"))
        .select(F.col("k").alias(key), "est_count")
    )
