"""Skew-mitigation operators (SURVEY §4.2 '100 TB posture').

AQE's skew-join splitting handles most cases automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py); these are the
explicit forms for when the skew is known ahead of time — a hot key in a
groupBy or join whose single reducer would otherwise run hours behind the
rest of the stage.

- ``salted_aggregate``: two-phase aggregation — partial agg on
  (key, salt), final agg on key. The hot key's rows spread over
  ``n_salts`` reducers in phase 1; phase 2 combines ``n_salts`` tiny rows.
- ``salted_join``     : big side salted deterministically, small side
  exploded across every salt — the classic replicate-the-dim recipe.

Both are pure DataFrame compositions: results are bit-identical to the
unsalted plans (verified in tests/test_scale.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n_salts: int, *cols: str) -> Column:
    """Deterministic salt in [0, n_salts): hash of the row's non-key
    columns (NOT random — reruns and retries must land identically)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(7)), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max} (the decomposable aggregates). Example::

        salted_aggregate(li, ["l_returnflag"],
                         {"n": ("l_orderkey", "count"),
                          "qty": ("l_quantity", "sum")})
    """
    salt_source = salt_source_cols or [c for c in df.columns if c not in key_cols][:1]
    salted = df.withColumn("_salt", _salt(n_salts, *salt_source))

    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.col(col)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(F.col(f"_p_{out}")).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(F.col(col)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(F.col(f"_p_{out}")).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(F.col(col)).alias(f"_p_{out}"))
            final_exprs.append(F.min(F.col(f"_p_{out}")).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(F.col(col)).alias(f"_p_{out}"))
            final_exprs.append(F.max(F.col(f"_p_{out}")).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    phase1 = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return phase1.groupBy(*key_cols).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    partitions; the small side replicates once per salt value (rows ×
    n_salts — only viable when small really is small, which is also when
    you'd rather broadcast; this exists for the mid-size case where the
    build side exceeds the broadcast threshold but a hot probe key still
    dominates a reducer).

    Only ``inner`` and ``left`` (big-side-preserving) joins are
    supported: the small side is replicated once per salt, so a
    ``right``/``full`` join would emit each UNMATCHED small-side row
    ``n_salts`` times — silently wrong, hence rejected."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner','left'), got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            "under right/full joins"
        )
    other_cols = [c for c in big.columns if c != key][:1] or [key]
    b = big.withColumn("_salt", _salt(n_salts, *other_cols))
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    s = small.crossJoin(F.broadcast(salts)).withColumnRenamed(key, f"_{key}_r")
    joined = b.join(
        s,
        (F.col(key) == F.col(f"_{key}_r")) & (b["_salt"] == s["_salt"]),
        how,
    )
    return joined.drop("_salt").drop(f"_{key}_r")
