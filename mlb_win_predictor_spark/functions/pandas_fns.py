"""Pandas UDF / UDAF / grouped-map surface (SURVEY §2.9).

The engine's hot paths are native expressions; these exist for the cases
that genuinely need Python semantics, in their Arrow-batched (never
row-at-a-time) forms:

- ``grouped_median_udaf``     : GROUPED_AGG pandas UDF (the evaluate()-
  shaped UDAF construct of SURVEY §2.9)
- ``standardize_per_group``   : grouped-map ``applyInPandas`` (per-group
  fit/transform, the sklearn-scaler-per-family pattern)

All closures are self-contained: workers need nothing on sys.path.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf reads
# the REAL type hints (pd.Series -> float) to infer the GROUPED_AGG
# eval type; stringified annotations break the inference.
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Median per group via a GROUPED_AGG pandas UDF (Arrow-batched)."""

    @F.pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(v.median())

    return df.groupBy(group_col).agg(_median(F.col(value_col)).alias("median_value"))


def standardize_per_group(
    df: DataFrame, group_col: str, value_cols: list[str]
) -> DataFrame:
    """Per-group z-score standardization via applyInPandas: each group's
    pandas frame is scaled with its own mean/std (ddof=0, sklearn
    semantics — the scaler the reference fits per feature family,
    modeling/modeling.ipynb:144)."""
    out_schema = ", ".join(
        [f"{group_col} string"]
        + [f"{c} double" for c in value_cols]
    )
    cols = list(value_cols)

    def scale(pdf):
        import pandas as _pd  # noqa: F401

        for c in cols:
            std = pdf[c].std(ddof=0)
            pdf[c] = 0.0 if std == 0 else (pdf[c] - pdf[c].mean()) / std
        return pdf

    return df.select(group_col, *value_cols).groupBy(group_col).applyInPandas(
        scale, schema=out_schema
    )
