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
from mlb_win_predictor_spark.session import persistent_rdd_count, release_caches

from .oracle import compare, duckdb_connection

PARITY_SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

ORACLE_CASES = sorted(name for name, qd in QUERIES.items() if qd.sql is not None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(PARITY_SF_DIR)
    yield c
    c.close()


@pytest.fixture(autouse=True)
def _no_cache_leak(spark):
    """Cache-lifetime contract (r6 verdict #2): after each entry's
    terminal action the harness releases every cache/localCheckpoint the
    entry registered and verifies executor storage is EMPTY — so a
    full-catalog sweep never times one query under another's memory
    pressure, and a future entry that pins storage some new way fails
    loudly here."""
    yield
    release_caches(spark)
    assert persistent_rdd_count(spark) == 0


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, con, name):
    qd = QUERIES[name]
    compare(qd.fn(spark, PARITY_SF_DIR), con, qd.sql)


def test_rows_only_queries_run(spark):
    for name, qd in QUERIES.items():
        if qd.sql is None:
            df = qd.fn(spark, PARITY_SF_DIR)
            assert df.count() >= 0, name
            release_caches(spark)
            assert persistent_rdd_count(spark) == 0, name


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
