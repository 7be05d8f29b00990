"""Deterministic weighted sampling without replacement (Efraimidis &
Spirakis 2006 A-Res), distributed.

Each row gets key ``u^(1/w)`` with ``u`` derived deterministically from
``xxhash64(id, seed)``; the k largest keys ARE a weighted sample without
replacement. Spark executes the top-k as ``TakeOrderedAndProject`` —
per-partition heaps merged on the driver, never a full sort — so the
pattern holds at any scale and re-runs identically (no RNG state, no
``rand()`` nondeterminism across retries; task retries recompute the same
keys, which ``sample()``/``rand()`` cannot guarantee).

Use cases in this engine's scope: importance-sampling a training corpus by
quality score, picking representative documents per source for human
review, downsampling heavy sources under a token budget (see
``mixture_weights``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_U_BUCKETS = 1 << 30


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, seed: int = 42
) -> DataFrame:
    """k-row weighted sample without replacement; rows with non-positive
    weight are never selected. Deterministic for a given (data, seed)."""
    u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_U_BUCKETS)) + 0.5) / F.lit(
        float(_U_BUCKETS)
    )
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_ares_key", key)
        .orderBy(F.desc("_ares_key"), F.col(id_col))
        .limit(k)
        .drop("_ares_key")
    )
