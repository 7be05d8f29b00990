"""Every oracle-checked catalog query must hash-match DuckDB (driver gate).

Runs at sf0.001 by default (fast inner loop); set
``PARITY_SF_DIR=/root/testdata/sf0.01`` to replicate the driver's scale.
Comparison is EXACT (float_tol=0) — the same bar the driver's value-hash
applies.
"""

from __future__ import annotations

import os

import pytest

from mlb_win_predictor_spark.queries import QUERIES

from .oracle import compare, duckdb_connection

PARITY_SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

ORACLE_CASES = sorted(name for name, qd in QUERIES.items() if qd.sql is not None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(PARITY_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, con, name):
    qd = QUERIES[name]
    compare(qd.fn(spark, PARITY_SF_DIR), con, qd.sql)


def test_rows_only_queries_run(spark):
    for name, qd in QUERIES.items():
        if qd.sql is None:
            df = qd.fn(spark, PARITY_SF_DIR)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(se.oracle_sql()).issubset(set(se.queries()))


def test_q22_non_vacuous(spark):
    """Round-2 verdict: q22 hash-matched on the EMPTY set, verifying
    nothing about the anti-join + scalar-subquery logic. The dormancy
    cutoff must keep the result non-empty at every test SF."""
    assert QUERIES["q22_sales_opportunity"].fn(spark, PARITY_SF_DIR).count() > 0


def test_iqr_outlier_filter_non_vacuous(spark):
    """Same lesson as q22: a Tukey-fence query over a uniform column
    hash-matches on the empty set. events.value has real outliers at
    every SF — keep it that way."""
    assert QUERIES["iqr_outlier_filter"].fn(spark, PARITY_SF_DIR).count() > 0
