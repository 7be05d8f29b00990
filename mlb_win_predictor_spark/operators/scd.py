"""Slowly-changing-dimension type 2 (CDC apply) without a table format.

The reference's UPDATE-in-place (src/function.py:480) loses history; the
warehouse-grade dual is SCD2: each change closes the current version row
and appends a new one. With Delta this is ``MERGE``; on plain parquet it
is expressible as anti-join + union + window (the engine keeps the
logical operator independent of the storage format).

``scd2_apply(current, updates, ...)`` takes the current SCD2 state
(key, attrs, valid_from, valid_to NULL=open) and a batch of updates
(key, attrs, effective ts) and returns the new state. One shuffle on the
key; updates for unseen keys insert an open row; updates equal to the
open row's attributes are no-ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attr_cols: list[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one CDC batch to SCD2 state; returns the full new state."""
    # latest update per key in the batch (late duplicates collapse)
    from pyspark.sql.window import Window as W

    wu = W.partitionBy(key).orderBy(F.col(ts_col).desc())
    latest = (
        updates.withColumn("_rn", F.row_number().over(wu))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    open_rows = current.filter(F.col(valid_to).isNull())
    closed_rows = current.filter(F.col(valid_to).isNotNull())

    j = open_rows.alias("cur").join(
        latest.alias("upd"), F.col(f"cur.{key}") == F.col(f"upd.{key}"), "full_outer"
    )
    changed = F.col(f"upd.{key}").isNotNull() & (
        F.col(f"cur.{key}").isNull()
        | ~F.struct(*[F.col(f"cur.{c}") for c in attr_cols]).eqNullSafe(
            F.struct(*[F.col(f"upd.{c}") for c in attr_cols])
        )
    )

    # open rows that stay open (no update, or identical attrs)
    kept_open = j.filter(F.col(f"cur.{key}").isNotNull() & ~changed).select(
        *[F.col(f"cur.{c}").alias(c) for c in [key, *attr_cols, valid_from, valid_to]]
    )
    # open rows closed by a change
    closed_now = j.filter(F.col(f"cur.{key}").isNotNull() & changed).select(
        *[F.col(f"cur.{c}").alias(c) for c in [key, *attr_cols, valid_from]],
        F.col(f"upd.{ts_col}").alias(valid_to),
    )
    # new open versions (changed or brand-new keys)
    new_open = j.filter(changed).select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{c}").alias(c) for c in attr_cols],
        F.col(f"upd.{ts_col}").alias(valid_from),
        F.lit(None).cast(open_rows.schema[valid_to].dataType).alias(valid_to),
    )
    return closed_rows.unionByName(kept_open).unionByName(closed_now).unionByName(new_open)
