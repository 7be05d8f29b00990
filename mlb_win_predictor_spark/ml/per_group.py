"""Per-group model fitting via grouped-map applyInPandas.

The 'one model per entity' pattern (per-team, per-segment, per-tenant):
each group's pandas frame fits a closed-form linear regression (normal
equations via numpy lstsq) on executors — thousands of small models train
in parallel with NO driver involvement, the shape MLlib's single-model
API can't express.

Closure is self-contained (local imports only): executors need numpy +
pandas, not this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fit_linear_per_group(
    df: DataFrame, group_col: str, x_cols: list[str], y_col: str
) -> DataFrame:
    """Returns one row per group: coefficients array (intercept first),
    n_rows, and in-sample RMSE."""
    xs = list(x_cols)
    y = y_col
    schema = f"{group_col} string, coef array<double>, n_rows long, rmse double"

    def fit(pdf):
        import numpy as _np
        import pandas as _pd

        sub = pdf[[*xs, y]].dropna()
        n = len(sub)
        key = str(pdf[group_col].iloc[0])
        if n < len(xs) + 1:
            return _pd.DataFrame(
                {"g": [key], "coef": [None], "n_rows": [n], "rmse": [None]}
            ).rename(columns={"g": group_col})
        X = _np.column_stack([_np.ones(n), sub[xs].to_numpy(dtype=float)])
        yv = sub[y].to_numpy(dtype=float)
        coef, *_ = _np.linalg.lstsq(X, yv, rcond=None)
        rmse = float(_np.sqrt(_np.mean((X @ coef - yv) ** 2)))
        return _pd.DataFrame(
            {
                "g": [key],
                "coef": [[float(c) for c in coef]],
                "n_rows": [n],
                "rmse": [rmse],
            }
        ).rename(columns={"g": group_col})

    return (
        df.select(group_col, *xs, y).groupBy(group_col).applyInPandas(fit, schema=schema)
    )
