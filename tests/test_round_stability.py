"""Cross-engine rounding-stability property test: the ``stable_round`` /
``sround`` idiom must agree between Spark and DuckDB on adversarial
doubles — including exact .5 grid points and tie-adjacent rationals
(the class that broke plain ROUND(x, k), see functions/scalars.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mlb_win_predictor_spark.functions.scalars import stable_round


@pytest.mark.parametrize("k", [2, 3, 6])
def test_stable_round_matches_duckdb(spark, k):
    rng = np.random.default_rng(123)
    vals = [
        float(v)
        for v in np.concatenate(
            [
                rng.uniform(-1e3, 1e3, 2000),                 # arbitrary doubles
                rng.integers(-(10**6), 10**6, 1000) / 10.0**k,  # exact grid points
                (rng.integers(-(10**6), 10**6, 1000) * 10 + 5)
                / 10.0 ** (k + 1),                             # half-ties
                np.array(
                    [27 * er / outs for er in range(1, 30) for outs in range(1, 60)]
                ),
            ]
        )
    ]
    sdf = spark.createDataFrame(list(enumerate(vals)), ["i", "x"])
    got = {
        r.i: r.y
        for r in sdf.select("i", stable_round(F.col("x"), k).alias("y")).collect()
    }
    con = duckdb.connect()
    # register a float64 frame (bit-exact), like the parquet the real
    # oracle reads — a giant VALUES list would go through decimal literal
    # unification and perturb values by an ulp
    import pandas as pd

    con.register(
        "t", pd.DataFrame({"i": range(len(vals)), "x": np.array(vals, dtype="float64")})
    )
    # 1e{k}: a plain float literal would parse as DECIMAL in DuckDB and
    # change the multiply (the exact bug this test exists to catch)
    want = dict(
        con.execute(f"SELECT i, (ROUND(x * 1e{k}) / 1e{k}) FROM t").fetchall()
    )
    mismatches = [
        (i, vals[i], got[i], want[i]) for i in got if got[i] != want[i]
    ]
    assert not mismatches, (len(mismatches), mismatches[:5])
