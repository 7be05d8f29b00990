"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet, then compares row count, column names, and order-insensitive
values. Floats compare exactly first; the assertion message reports the
max delta so near-misses (nondeterministic float aggregation) are
distinguishable from logic bugs.
"""

from __future__ import annotations

import math

import duckdb


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    import datetime

    import pandas as pd

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        # a DATE read back as midnight timestamp == the date itself
        return v.date().isoformat() if v == v.normalize() else v.isoformat()
    if isinstance(v, datetime.datetime):
        return (
            v.date().isoformat()
            if v.time() == datetime.time(0, 0)
            else v.isoformat()
        )
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _key(row):
    return tuple(
        (x is None, "" if x is None else str(type(x).__name__), str(_norm(x))) for x in row
    )


def compare(spark_df, con, sql: str, float_tol: float = 0.0) -> None:
    """Assert spark result == duckdb result (order-insensitive)."""
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()

    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(sdf) == len(ddf), f"row count mismatch: spark={len(sdf)} duckdb={len(ddf)}"
    for c in s_cols:
        sk = sdf[c].dtype.kind
        dk = ddf[c].dtype.kind
        # int columns with NULLs surface as 'f'/'O' in pandas — allow that
        # pairing, but flag int-vs-float (e.g. DuckDB HUGEINT widening).
        ok = sk == dk or {sk, dk} <= {"i", "O"} or {sk, dk} <= {"f", "O"} or (
            {sk, dk} == {"i", "f"} and (sdf[c].isna().any() or ddf[c].isna().any())
        ) or {sk, dk} <= {"M", "O"}  # date columns: object(date) vs datetime64
        assert ok, f"dtype-kind mismatch on {c}: spark={sdf[c].dtype} duckdb={ddf[c].dtype}"

    srows = sorted(
        (tuple(row) for row in sdf[s_cols].itertuples(index=False, name=None)), key=_key
    )
    drows = sorted(
        (tuple(row) for row in ddf[d_cols].itertuples(index=False, name=None)), key=_key
    )
    max_delta = 0.0
    for i, (sr, dr) in enumerate(zip(srows, drows)):
        for c, (a, b) in enumerate(zip(sr, dr)):
            if _values_eq(_norm(a), _norm(b), float_tol):
                continue
            if isinstance(a, float) and isinstance(b, float):
                max_delta = max(max_delta, abs(a - b))
            raise AssertionError(
                f"value mismatch at sorted-row {i} col {s_cols[c]}: "
                f"spark={a!r} duckdb={b!r} (max_float_delta so far {max_delta})"
            )


def _values_eq(a, b, tol: float) -> bool:
    import pandas as pd

    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if fa == fb:
            return True
        if tol > 0:
            denom = max(abs(fa), abs(fb), 1e-12)
            return abs(fa - fb) / denom <= tol
        return False
    return str(a) == str(b)
