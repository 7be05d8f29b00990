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

# oracle SQL that is valid Spark SQL verbatim AND value-matches the
# DataFrame implementation (round-4 sweep: every oracle text was run
# through spark.sql and compared; the 75 below pass, the rest use
# DuckDB-only constructs — strftime, list_*, unnest, generate_series —
# whose Spark duals are separate catalog entries).
PORTABLE = [
    "q1_pricing_summary",
    # q3 uses DuckDB strftime for date bucketing — not portable
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_volume",
    "q12_late_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q20_excess_share_supplier",
    "q21_waiting_supplier",
    "q22_sales_opportunity",
    "filtered_aggregates",  # ANSI FILTER clause — dialect-common by design
    "percentile_within_group",  # SQL:2008 WITHIN GROUP — dialect-common
    "regression_aggregates",  # SQL:2003 regr_* family — dialect-common
    "asof_prior_stats",
    "bag_set_operations",
    "bitmap_distinct_rollup",
    "benford_digit_distribution",  # exact-integer digit extraction — dialect-common by design
    "broadcast_dim_join",
    "cdc_apply_changelog",
    "confusion_matrix_metrics",
    "corr_matrix",
    "count_rows",
    "cross_join_dims",
    "cube_aggregation",
    "dedup_exact",
    "dedup_latest_event",
    "dense_global_index",
    "derived_columns",
    "distinct_count",
    "drop_columns",
    "dropna_funnel",
    "edit_distance_pairs",
    # ewma_user_activity removed: its EWMA_SQL densifies the calendar with
    # DuckDB-only UNNEST(generate_series(...)) — no dialect-common spelling
    # (Spark uses sequence()/explode). DataFrame<->DuckDB oracle parity for
    # the entry is still covered by the oracle sweep.
    "first_last_window",
    "first_match_lookup",
    "flagship_asof_funnel",
    "grouping_sets_agg",
    "guarded_division",
    "having_filter_sql_api",
    "histogram_binning",
    "join_cardinality_estimate",
    "key_skew_profile",
    "kl_divergence_slices",
    "lag_lead_sequence",
    "late_outcome_upsert",
    "lateral_topn_subquery",
    "limit_topk",
    "max_by_leaderboard",
    "merge_upsert",
    "pivot_wide",
    "quantile_binning",
    "range_join_bands",
    "ranking_functions",
    "recursive_hierarchy_rollup",
    "rollup_aggregation",
    "scan_project_filter",
    "semi_anti_join",
    "set_operations",
    "string_functions",
    "table_diff_reconcile",
    "topk_per_group",
    "union_distinct",
    "unpivot_measures",
    "unpivot_melt",
    "window_distribution_functions",
    "zscore_anomalies",
    "event_transition_matrix",
    "growth_accounting",
    "scd2_asof_snapshot",  # timestamp-native since r5 — one text, both engines
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


# ---------------------------------------------------------------------------
# Tri-modal LLM-pipeline entries: for each entry below, ONE portable SQL
# text runs verbatim on BOTH Spark and DuckDB and must equal the DataFrame
# API implementation. Tokenization without explode/unnest (neither is
# dialect-common): a positions table (row_number over `orders`) joined on
# i <= n_tokens, with `split_part` (1-based on both engines) extracting
# the i-th word and `length - length(translate(text,' ','')) + 1` counting
# words — exact because the synthetic corpus is single-space-separated
# lowercase alnum (asserted below, so a testdata change fails loudly, not
# silently).

_PORTABLE_TOKS = """
WITH pos AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS INT) AS i
  FROM orders LIMIT 128
), docs AS (
  SELECT doc_id, lang, source, text,
         length(text) - length(translate(text, ' ', '')) + 1 AS n_toks
  FROM documents
), toks AS (
  SELECT d.doc_id, d.lang, split_part(d.text, ' ', p.i) AS w
  FROM docs d JOIN pos p ON p.i <= d.n_toks
)
"""

PORTABLE_TEXT_SQL = {
    "word_entropy_quality": _PORTABLE_TOKS
    + """
, wc AS (
  SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w
), per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         SUM(c * LN(c)) AS sum_clnc
  FROM wc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       ROUND((LN(n_tokens) - sum_clnc / n_tokens) * 1e6) / 1e6 AS word_entropy
FROM per_doc
""",
    "unigram_logprob_quality": _PORTABLE_TOKS
    + """
, wc AS (
  SELECT w, COUNT(*) AS c FROM toks GROUP BY w
), total AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM wc
), dc AS (
  SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w
), per_doc AS (
  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
         SUM(CAST(k AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS sum_klnc
  FROM dc JOIN wc ON dc.w = wc.w GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       ROUND((LN(n_total) - sum_klnc / CAST(n_tokens AS DOUBLE)) * 1e6) / 1e6 AS avg_nll
FROM per_doc CROSS JOIN total
""",
    "vocab_top_terms": _PORTABLE_TOKS
    + """
, counts AS (
  SELECT lang, w AS term, CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY lang, w
), ranked AS (
  SELECT lang, term, tf, df,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tf DESC, term ASC) AS rnk
  FROM counts
)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, term, tf, df
FROM ranked WHERE rnk <= 20
""",
    "token_budget_sample": """
WITH toked AS (
  SELECT doc_id, source,
         CAST(length(text) - length(translate(text, ' ', '')) + 1 AS BIGINT) AS n_toks,
         md5(CAST(doc_id AS STRING)) AS h
  FROM documents
), run AS (
  SELECT source, n_toks,
         SUM(n_toks) OVER (PARTITION BY source ORDER BY h, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum_toks
  FROM toked
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_total,
       CAST(SUM(n_toks) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN cum_toks <= 800 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(MAX(CASE WHEN cum_toks <= 800 THEN cum_toks ELSE 0 END) AS BIGINT) AS tokens_kept
FROM run GROUP BY source
""",
    # these two oracle texts are ALREADY dialect-common — run them verbatim
    "dedup_exact": None,
    "kl_divergence_slices": None,
    # r4 verdict item #8: the growth-analytics stickiness entry. The
    # oracle text day-explodes via DuckDB generate_series; this portable
    # dual replicates each (user, day) observation through the positions
    # table instead (join i <= win), with the dialect-common
    # day + (i-1) * INTERVAL arithmetic growth_accounting already uses.
    "user_stickiness": """
WITH pos AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS INT) AS i
  FROM orders LIMIT 36
), obs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), span AS (
  SELECT MAX(day) AS mx FROM obs
), reported AS (
  SELECT o.user_id, w.win,
         CAST(o.day + (p.i - 1) * INTERVAL 1 DAY AS DATE) AS report_day
  FROM obs o
  CROSS JOIN (VALUES (1), (7), (28)) AS w(win)
  JOIN pos p ON p.i <= w.win
), counts AS (
  SELECT report_day,
         COUNT(DISTINCT CASE WHEN win = 1 THEN user_id END) AS dau,
         COUNT(DISTINCT CASE WHEN win = 7 THEN user_id END) AS wau,
         COUNT(DISTINCT CASE WHEN win = 28 THEN user_id END) AS mau
  FROM reported CROSS JOIN span
  WHERE report_day <= mx
  GROUP BY report_day
)
SELECT report_day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       CAST(mau AS BIGINT) AS mau,
       ROUND(CAST(dau AS DOUBLE) / mau * 1e6) / 1e6 AS stickiness
FROM counts
""",
}


def test_corpus_is_single_space_lowercase(spark, views):
    """The portable tokenizer's correctness precondition: words separated
    by single spaces, no other whitespace, lowercase alnum only, and doc
    length within the 128-slot positions table."""
    bad = spark.sql(
        "SELECT COUNT(*) AS n FROM documents "
        "WHERE text RLIKE '[^a-z0-9 ]' OR text LIKE '%  %' "
        "OR text <> trim(text) "
        "OR length(text) - length(translate(text, ' ', '')) + 1 > 128"
    ).first()["n"]
    assert bad == 0


@pytest.mark.parametrize("name", sorted(PORTABLE_TEXT_SQL))
def test_llm_pipeline_entries_trimodal(spark, views, name):
    """DataFrame API ≡ spark.sql(portable) ≡ DuckDB(portable) — the same
    SQL text on both engines, matching the DataFrame implementation."""
    from tests.oracle import compare, duckdb_connection

    sql = PORTABLE_TEXT_SQL[name] or QUERIES[name].sql
    con = duckdb_connection(SF)
    try:
        via_df = QUERIES[name].fn(spark, SF)
        via_sql = spark.sql(sql)
        compare(via_df, con, sql)   # DataFrame ≡ DuckDB
        compare(via_sql, con, sql)  # spark.sql ≡ DuckDB (⇒ all three)
    finally:
        con.close()


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
