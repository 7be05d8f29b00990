"""SQL-surface parity: the catalog's oracle SQL strings are written in
portable ANSI SQL wherever the operators allow, so a reference user can
run the SAME text through ``spark.sql`` (their production engine) and
DuckDB (the correctness oracle) and get the DataFrame API's results.

This pins that tri-modal equivalence for the TPC-H-shaped core: for each
listed query, ``spark.sql(oracle_sql)`` over temp views of the testdata
must equal the DataFrame-API implementation row-for-row. Queries using
DuckDB-only constructs (list_transform, json_extract_string, unnest) are
deliberately absent — their Spark duals are separate catalog entries.
"""

from __future__ import annotations

import math

import pytest

from mlb_win_predictor_spark.queries import QUERIES
from mlb_win_predictor_spark.session import load_table

SF = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# oracle SQL that is valid Spark SQL verbatim
PORTABLE = [
    "q1_pricing_summary",
    # q3 uses DuckDB strftime for date bucketing — not portable
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_volume",
    "q12_late_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q21_waiting_supplier",
]


@pytest.fixture(scope="module")
def views(spark):
    for t in TABLES:
        load_table(spark, SF, t).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


def _key(row):
    out = []
    for v in row:
        if isinstance(v, float):
            out.append(round(v, 6))
        else:
            out.append(v)
    return tuple(str(x) for x in out)


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_verbatim_on_spark(spark, views, name):
    sql = QUERIES[name].sql
    via_sql = spark.sql(sql)
    via_df = QUERIES[name].fn(spark, SF)
    assert sorted(c.lower() for c in via_sql.columns) == sorted(
        c.lower() for c in via_df.columns
    )
    cols = sorted(via_df.columns, key=str.lower)
    a = sorted(_key(r) for r in via_sql.select(*cols).collect())
    b = sorted(_key(r) for r in via_df.select(*cols).collect())
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            try:
                fa, fb = float(va), float(vb)
                assert math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9), (ra, rb)
            except ValueError:
                assert va == vb, (ra, rb)


def test_recursive_cte_sql_is_dialect_common(spark, views):
    """The recursive entry's ONE SQL text runs on both engines (the
    catalog fn already executes it via spark.sql; parity covers DuckDB)."""
    from mlb_win_predictor_spark.queries.extra import RECURSIVE_HIERARCHY_SQL

    assert spark.sql(RECURSIVE_HIERARCHY_SQL).count() > 0


def test_group_by_all_matches_explicit(spark, views):
    """Spark 4 / DuckDB shared sugar: GROUP BY ALL groups on every
    non-aggregate select item — same result as the explicit keys."""
    sugar = spark.sql(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n "
        "FROM orders GROUP BY ALL"
    )
    explicit = spark.sql(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n "
        "FROM orders GROUP BY o_orderstatus, o_orderpriority"
    )
    assert sorted(map(tuple, sugar.collect())) == sorted(map(tuple, explicit.collect()))
