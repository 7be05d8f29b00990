"""Core relational operator catalog (SURVEY.md §2.1-2.6).

Each entry re-expresses a reference operator over the driver testdata
tables with a DuckDB oracle. Reference citations are in each docstring.

Scale notes (100 TB posture):
- broadcast-hint policy: ``F.broadcast`` is pinned ONLY on sides bounded
  by construction — constant-domain dims (nation=25, region=5), 1-row
  global aggregates, and bounded-group-count aggregates. Sides that scale
  with the data (part/customer/supplier scans and any per-part/per-supp
  aggregate) carry NO hint: at bench scale the size-based planner
  broadcasts them anyway (all dims are KBs), and at 100 TB — where a
  pinned hint would be a driver OOM since hints override the threshold —
  the planner/AQE falls back to a shuffled join. The hint inventory and
  each bound lives in SCALE.md §broadcast-audit;
- aggregations are expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the exchange;
- filters/projections sit directly on the scan so parquet gets
  PushedFilters + pruned ReadSchema;
- no collect()-driven logic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import scalars as S
from ..session import load_table
from .base import QueryDef

D2 = "decimal(18,2)"


# ---------------------------------------------------------------- A1/A-family


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped aggregation (SURVEY §2.5 A1 describe-style digest).

    Money math in DECIMAL so the partial-aggregation tree is exact and
    order-insensitive; cast to double only at the end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    charge = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(D2)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(D2)).cast("double").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(28,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,6)")).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast(D2)).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (F.sum(F.col("l_extendedprice").cast(D2)).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(F.col("l_discount").cast(D2)).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax), 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)      AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------ scans / filters


def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+P3: projection + predicate directly on the parquet scan.

    Catalyst pushes both into the reader (PushedFilters / 2-column
    ReadSchema) — the fix for the reference's ``select *`` + late drop
    (modeling/eda.ipynb:60,248).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_totalprice")


SCAN_PROJECT_FILTER_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderstatus = 'F' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
"""


def drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — column drop (modeling/eda.ipynb:248 cell 12 drops 7 cols)."""
    c = load_table(spark, sf_dir, "customer")
    return c.drop("c_name", "c_acctbal")


DROP_COLUMNS_SQL = "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer"


def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — head/limit with a total order (deterministic top-10)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


LIMIT_TOPK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — len(df) (modeling/eda.ipynb cells 8,16)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


COUNT_ROWS_SQL = "SELECT COUNT(*) AS n_rows FROM lineitem"


# ------------------------------------------------------- derived columns (D*)


def guarded_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — k_bb_ratio-style guarded division (modeling/eda.ipynb:451-465):
    NULL when the denominator is 0 (2941 zero-discount rows at sf0.01)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        S.guarded_div(F.col("l_tax").cast("double"), F.col("l_discount").cast("double")).alias(
            "tax_disc_ratio"
        ),
    )


GUARDED_DIVISION_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount IS NULL OR l_discount = 0 THEN NULL
            ELSE l_tax / l_discount END AS tax_disc_ratio
FROM lineitem
"""


def dropna_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — the reference's dropna funnel (2129→1693→1673,
    modeling/eda.ipynb cells 15,24): derive a null-bearing ratio column,
    drop any-null rows, count the funnel stages."""
    li = load_table(spark, sf_dir, "lineitem")
    with_ratio = li.select(
        "l_orderkey",
        S.guarded_div(F.col("l_tax").cast("double"), F.col("l_discount").cast("double")).alias(
            "ratio"
        ),
    )
    kept = with_ratio.na.drop("any")
    return kept.agg(
        F.count(F.lit(1)).alias("rows_after_dropna"),
    )


DROPNA_FUNNEL_SQL = """
SELECT COUNT(*) AS rows_after_dropna FROM (
  SELECT l_orderkey,
         CASE WHEN l_discount IS NULL OR l_discount = 0 THEN NULL
              ELSE l_tax / l_discount END AS ratio
  FROM lineitem
) WHERE l_orderkey IS NOT NULL AND ratio IS NOT NULL
"""


def derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D3/D7 — differential feature + binary label + fixed-point fmt
    (modeling/eda.ipynb:593-628; src/function.py:87,110). Pointwise double
    arithmetic is bit-deterministic so no rounding shims are needed."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "inner")
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") - F.col("p_retailprice") * F.col("l_quantity")).alias(
                "price_comp"
            ),
            F.when(F.col("l_extendedprice") > F.col("p_retailprice") * F.col("l_quantity"), 1)
            .otherwise(0)
            .alias("premium_label"),
            F.round(F.col("l_discount") * 100, 2).alias("disc_pct"),
        )
    )


DERIVED_COLUMNS_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice - p_retailprice * l_quantity AS price_comp,
       CASE WHEN l_extendedprice > p_retailprice * l_quantity THEN 1 ELSE 0 END AS premium_label,
       ROUND(l_discount * 100, 2) AS disc_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def decode_ip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — base-3 innings-pitched decode (src/function.py:186-192)
    exercised on synthesized '<whole>.<outs>' strings."""
    li = load_table(spark, sf_dir, "lineitem")
    ip_str = F.concat(
        F.col("l_quantity").cast("long").cast("string"),
        F.lit("."),
        (F.col("l_linenumber") % 3).cast("string"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ip_str.alias("ip_raw"),
        S.decode_ip_str(ip_str).alias("ip_decoded"),
    )


DECODE_IP_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '.' || CAST(l_linenumber % 3 AS VARCHAR) AS ip_raw,
       CAST(CAST(l_quantity AS BIGINT) AS DOUBLE)
         + CAST((l_linenumber % 3) * 3 AS DOUBLE) / 10.0 AS ip_decoded
FROM lineitem
"""


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 — yesterday/today formatting (src/function.py:469-470,549):
    date_sub + MM/dd/yyyy formatting, month bucketing as strings."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "MM/dd/yyyy").alias("order_date_us"),
        F.date_format(F.date_sub(F.col("o_orderdate"), 1), "yyyy-MM-dd").alias("prev_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    )


DATE_ARITHMETIC_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%m/%d/%Y')                    AS order_date_us,
       strftime(o_orderdate - INTERVAL 1 DAY, '%Y-%m-%d')   AS prev_day,
       strftime(o_orderdate, '%Y-%m')                       AS order_month
FROM orders
"""


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8/D10 — string surgery: sanitize/replace/case/substr/concat
    (src/function.py:42,371-375,529)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_key"),
        F.substring(F.col("p_brand"), 7, 10).alias("brand_num"),
        F.length(F.col("p_type")).cast("long").alias("type_len"),
        F.concat(F.lit("<li>"), F.col("p_name"), F.lit("</li>")).alias("name_li"),
        F.trim(F.col("p_type")).alias("type_trim"),
    ).filter(F.col("p_name").like("%bolt%"))


STRING_FUNCTIONS_SQL = """
SELECT p_partkey,
       UPPER(p_name)                        AS name_upper,
       REPLACE(p_name, ' ', '_')            AS name_key,
       SUBSTRING(p_brand, 7, 10)            AS brand_num,
       CAST(LENGTH(p_type) AS BIGINT)       AS type_len,
       '<li>' || p_name || '</li>'          AS name_li,
       TRIM(p_type)                         AS type_trim
FROM part WHERE p_name LIKE '%bolt%'
"""


def try_cast_null_on_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 — null-on-bad-cast parity with the reference's try/except->None
    accessors (src/function.py:87,135,...). try_cast works under ANSI too."""
    p = load_table(spark, sf_dir, "part")
    mixed = F.when(F.col("p_size") % 2 == 0, F.col("p_size").cast("string")).otherwise(
        F.col("p_type")
    )
    return p.select(
        "p_partkey",
        mixed.alias("mixed_raw"),
        mixed.try_cast("double").alias("mixed_as_double"),
    )


TRY_CAST_SQL = """
SELECT p_partkey,
       CASE WHEN p_size % 2 = 0 THEN CAST(p_size AS VARCHAR) ELSE p_type END AS mixed_raw,
       TRY_CAST(CASE WHEN p_size % 2 = 0 THEN CAST(p_size AS VARCHAR) ELSE p_type END AS DOUBLE) AS mixed_as_double
FROM part
"""


# ---------------------------------------------------------------------- joins


def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 — dim enrichment as broadcast hash joins (replaces the
    reference's per-row HTTP lookups, src/function.py:66,486). nation and
    region broadcast; the customer fact side never shuffles."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("c_custkey", "c_mktsegment", "n_name", "r_name")
    )


BROADCAST_DIM_JOIN_SQL = """
SELECT c_custkey, c_mktsegment, n_name, r_name
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
"""


def first_match_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 tie-break — the reference's first-match ``[0]`` on lookups
    (src/function.py:66): earliest order per customer via row_number()==1."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


FIRST_MATCH_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (SURVEY §2.4 'absent from reference' built-ins):
    customers with no 1995 orders, tagged; EXISTS/NOT EXISTS duals."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    with_ = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey").withColumn(
        "bucket", F.lit("has_1995_order")
    )
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey").withColumn(
        "bucket", F.lit("no_1995_order")
    )
    return with_.unionByName(without)


SEMI_ANTI_SQL = """
SELECT c_custkey, 'has_1995_order' AS bucket FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
UNION ALL
SELECT c_custkey, 'no_1995_order' AS bucket FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
"""


def asof_prior_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — as-of 'stats going into the game' (reference README.md:26-28):
    per order, COUNT/AVG of the customer's *prior* orders via a
    rowsBetween(unboundedPreceding, -1) frame. Decimal running sum keeps
    the value exact regardless of partition layout."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior_cnt = F.count(F.lit(1)).over(w)
    prior_sum = F.sum(F.col("o_totalprice").cast(D2)).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prior_cnt.alias("prior_orders"),
        (prior_sum.cast("double") / prior_cnt).alias("prior_avg_price"),
    )


ASOF_PRIOR_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       COUNT(*) OVER w AS prior_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS prior_avg_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/S9 — MERGE-shaped outcome upsert (src/function.py:480-513):
    base rows updated where a delta matches, kept otherwise, plus
    delta-only rows appended (full-outer-join emulation of Delta MERGE;
    SURVEY §7 documents Delta as the production path)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    delta = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(D2)).cast("double").alias("open_total"))
    )
    merged = c.join(delta, c.c_custkey == delta.o_custkey, "full_outer")
    return merged.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        F.coalesce(F.col("open_total"), F.col("c_acctbal")).alias("balance"),
        F.when(F.col("open_total").isNotNull() & F.col("c_custkey").isNotNull(), "updated")
        .when(F.col("c_custkey").isNull(), "inserted")
        .otherwise("unchanged")
        .alias("merge_action"),
    )


MERGE_UPSERT_SQL = """
WITH delta AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_total
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
)
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       COALESCE(open_total, c_acctbal) AS balance,
       CASE WHEN open_total IS NOT NULL AND c_custkey IS NOT NULL THEN 'updated'
            WHEN c_custkey IS NULL THEN 'inserted'
            ELSE 'unchanged' END AS merge_action
FROM customer FULL OUTER JOIN delta ON c_custkey = o_custkey
"""


# ----------------------------------------------------- aggregations / windows


def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — describe(): count/null_count/mean/std/min/quartiles/max
    (modeling/eda.ipynb cells 7,18,39). Exact percentile (not approx) to
    match the oracle; stddev rounded — float merge order contributes
    ~1e-12 relative fuzz."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.agg(
        F.count(q).alias("cnt"),
        F.sum(q.isNull().cast("long")).alias("null_count"),
        (F.sum(q.cast(D2)).cast("double") / F.count(q)).alias("mean"),
        S.stable_round(F.stddev(q), 4).alias("std"),
        F.min(q).alias("min_v"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.max(q).alias("max_v"),
    )


SUMMARY_STATS_SQL = """
SELECT COUNT(l_quantity) AS cnt,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS mean,
       (ROUND(STDDEV_SAMP(l_quantity) * 1e4) / 1e4) AS std,
       MIN(l_quantity) AS min_v,
       QUANTILE_CONT(l_quantity, 0.25) AS p25,
       QUANTILE_CONT(l_quantity, 0.5)  AS p50,
       QUANTILE_CONT(l_quantity, 0.75) AS p75,
       MAX(l_quantity) AS max_v
FROM lineitem
"""


def histogram_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — histogram distribution (modeling/eda.ipynb:842 cell 33):
    fixed-width buckets over order totals."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 30000).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


HISTOGRAM_SQL = """
SELECT CAST(FLOOR(o_totalprice / 30000) AS BIGINT) AS bucket, COUNT(*) AS n
FROM orders GROUP BY 1
"""


def max_by_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — best-model-per-family selection (modeling/modeling.ipynb:1925-1999):
    top row per group, deterministic tie-break (acctbal desc, custkey asc)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


MAX_BY_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn = 1
"""


def string_agg_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+D10 — email digest: counts + concatenated <li> items
    (src/function.py:371-384). Sorted collect_list == ordered string_agg."""
    o = load_table(spark, sf_dir, "orders")
    top = (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
        .select("o_orderpriority", "o_orderkey")
    )
    li = F.concat(F.lit("<li>"), F.col("o_orderkey").cast("string"), F.lit("</li>"))
    return top.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.concat_ws("", F.array_sort(F.collect_list(li))).alias("digest"),
    )


STRING_AGG_SQL = """
WITH top AS (
  SELECT o_orderpriority, o_orderkey FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
)
SELECT o_orderpriority, COUNT(*) AS n_items,
       STRING_AGG('<li>' || CAST(o_orderkey AS VARCHAR) || '</li>', ''
                  ORDER BY '<li>' || CAST(o_orderkey AS VARCHAR) || '</li>') AS digest
FROM top GROUP BY o_orderpriority
"""


def confusion_matrix_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — classification metrics from (truth, pred) pairs
    (modeling/modeling.ipynb:233-239): accuracy/precision/recall/F1 as a
    confusion-matrix aggregation. 'Truth' = order has >4 lineitems;
    'pred' = order total above median-ish constant."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    truth = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .select("l_orderkey", (F.col("n_items") > 4).cast("int").alias("truth"))
    )
    scored = o.join(truth, o.o_orderkey == truth.l_orderkey, "inner").select(
        (F.col("o_totalprice") > 150000).cast("int").alias("pred"), "truth"
    )
    cm = scored.agg(
        F.sum((F.col("truth") * F.col("pred"))).alias("tp"),
        F.sum(((1 - F.col("truth")) * F.col("pred"))).alias("fp"),
        F.sum((F.col("truth") * (1 - F.col("pred")))).alias("fn"),
        F.sum(((1 - F.col("truth")) * (1 - F.col("pred")))).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return cm.select(
        tp,
        fp,
        fn,
        tn,
        S.stable_round((tp + tn).cast("double") / (tp + fp + fn + tn), 6).alias("accuracy"),
        S.stable_round(tp.cast("double") / (tp + fp), 6).alias("precision_"),
        S.stable_round(tp.cast("double") / (tp + fn), 6).alias("recall_"),
        S.stable_round(2 * tp.cast("double") / (2 * tp + fp + fn), 6).alias("f1"),
    )


CONFUSION_SQL = """
WITH truth AS (
  SELECT l_orderkey, CASE WHEN COUNT(*) > 4 THEN 1 ELSE 0 END AS truth
  FROM lineitem GROUP BY l_orderkey
), scored AS (
  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS pred, truth
  FROM orders JOIN truth ON o_orderkey = l_orderkey
), cm AS (
  SELECT CAST(SUM(truth*pred) AS BIGINT) AS tp, CAST(SUM((1-truth)*pred) AS BIGINT) AS fp,
         CAST(SUM(truth*(1-pred)) AS BIGINT) AS fn, CAST(SUM((1-truth)*(1-pred)) AS BIGINT) AS tn
  FROM scored
)
SELECT tp, fp, fn, tn,
       (ROUND(CAST(tp+tn AS DOUBLE)/(tp+fp+fn+tn) * 1e6) / 1e6) AS accuracy,
       (ROUND(CAST(tp AS DOUBLE)/(tp+fp) * 1e6) / 1e6) AS precision_,
       (ROUND(CAST(tp AS DOUBLE)/(tp+fn) * 1e6) / 1e6) AS recall_,
       (ROUND(2*CAST(tp AS DOUBLE)/(2*tp+fp+fn) * 1e6) / 1e6) AS f1
FROM cm
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (SURVEY §2.6): top-3 orders per priority by total."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            F.col("rnk").cast("long").alias("rnk"),
            "o_orderkey",
            "o_totalprice",
        )
    )


TOPK_PER_GROUP_SQL = """
SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def lag_lead_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead (SURVEY §2.6): previous/next order total per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_total"),
        F.lead("o_totalprice", 1).over(w).alias("next_total"),
    )


LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice, 1)  OVER w AS prev_total,
       LEAD(o_totalprice, 1) OVER w AS next_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union/intersect/except (SURVEY §2.6): 1995-vs-1996 purchaser sets."""

    def buyers(year: int):
        o = load_table(spark, sf_dir, "orders")
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = buyers(1995), buyers(1996)
    return (
        y95.intersect(y96).withColumn("bucket", F.lit("both"))
        .unionByName(y95.exceptAll(y96).withColumn("bucket", F.lit("only_1995")))
        .unionByName(y96.exceptAll(y95).withColumn("bucket", F.lit("only_1996")))
    )


SET_OPS_SQL = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
SELECT o_custkey, 'both' AS bucket FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT o_custkey, 'only_1995' AS bucket FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
UNION ALL
SELECT o_custkey, 'only_1996' AS bucket FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
"""


def rollup_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollup/cube (SURVEY §2.5 'absent' built-ins): subtotal lattice over
    (returnflag, linestatus); NULL lattice cells coalesced to 'ALL'."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(D2)).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct + count(distinct) (SURVEY §2.5 'absent' built-ins)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


DISTINCT_COUNT_SQL = """
SELECT COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders
"""


def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot (SURVEY §2.6 engine surface): returnflag × linestatus matrix."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(D2)).cast("double"))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
    )


PIVOT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""




def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: 3-way join (dim filter -> fact -> fact) + agg +
    deterministic top-10 — the multi-join analytics shape. The customer
    filter prunes before the join; revenue in DECIMAL."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(F.sum(revenue.cast("decimal(28,6)")).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY 1, 2
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: 5-way star join through two dim hops + per-nation
    revenue — broadcast dims, fact side never shuffles until the agg."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.sum(revenue.cast("decimal(28,6)")).cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: returned-item revenue per customer for one
    quarter — fact/fact shuffle join + a shuffled customer join (customer
    is NOT broadcast: at 100 TB it's a fact-sized table; AQE may still
    downgrade to broadcast at small SF) + broadcast nation, deterministic
    top-20 on the exact DECIMAL revenue."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue.cast("decimal(28,6)")).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


Q18_QTY_THRESHOLD = 300


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: orders whose total quantity exceeds a threshold,
    joined back to orders + customer. The inner agg is a map-side-partial
    hash agg over the fact; the HAVING filter shrinks it to a handful of
    keys, so the join back is broadcast-sized at any SF (AQE picks that
    up at runtime)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY_THRESHOLD)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_QTY_THRESHOLD}
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey  = c_custkey
ORDER BY sum_qty DESC, o_orderkey ASC
LIMIT 100
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped: the pushdown showcase — a highly selective
    single-table scan-and-sum. All three predicates and the 4-column
    projection reach the parquet reader (PushedFilters/ReadSchema pinned
    in test_plans.py); at 100 TB this is the query where column pruning
    + predicate pushdown + partial agg do ALL the work: no shuffle wider
    than one row per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    revenue = F.round(F.col("l_extendedprice") * F.col("l_discount"), 6)
    return sel.agg(
        F.sum(revenue.cast("decimal(28,6)")).cast("double").alias("revenue")
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*l_discount, 6) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: EXISTS → left-semi join. Orders in one quarter
    with at least one line shipped >60 days after the order date (the
    testdata has no commit/receipt dates, so "late ship" stands in for
    Q4's commit<receipt). The semi join carries no payload columns and
    deduplicates on the build side — strictly cheaper than inner-join +
    distinct at any scale."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped: disjunctive (OR-of-ANDs) predicate across a
    part⋈lineitem broadcast join. Catalyst extracts the common
    `p_partkey = l_partkey` conjunct so the join stays a broadcast hash
    join with the OR evaluated post-join; the p_size/p_brand legs also
    prune the broadcast side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    leg = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= size_hi)
        & (F.col("l_quantity") >= q_lo)
        & (F.col("l_quantity") <= q_hi)
    )
    sel = j.filter(leg("Brand#1", 15, 1, 11) | leg("Brand#2", 25, 10, 20) | leg("Brand#3", 35, 20, 30))
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return sel.agg(
        F.sum(revenue.cast("decimal(28,6)")).cast("double").alias("revenue")
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped: the dual-role dimension join — nation joins TWICE
    (supplier side and customer side) with a cross-pair filter, revenue
    per (supp_nation, cust_nation, year). Both nation hops broadcast; the
    only wide dependency is the final 3-key aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("l_year"))
        .agg(F.sum(revenue.cast("decimal(28,6)")).cast("double").alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey  = s_suppkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY 1, 2, 3
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped: profit per (nation, year) for one product family
    (p_name LIKE pattern; the testdata part has no supplycost, so profit
    = discounted revenue). Part and supplier/nation broadcast; the LIKE
    prunes the part build side before broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%e%"))
    amount = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount.cast("decimal(28,6)")).cast("double").alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%e%'
GROUP BY 1, 2
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped: conditional-aggregate ratio — share of one
    month's revenue from promo-class parts, as 100 * sum(CASE)/sum(all)
    in a single pass over the joined fact (no second scan). Exact DECIMAL
    partials; the final ratio is one double division."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).cast(
        "decimal(28,6)"
    )
    promo = F.when(F.col("p_type").like("PROMO%"), revenue).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    j = li.join(p, li.l_partkey == p.p_partkey)
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(revenue).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))
                        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
            / CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped: the view + scalar-max pattern — per-supplier
    quarterly revenue, then the supplier(s) achieving the global max
    (a 1-row broadcast join, not a sort). The revenue 'view' is computed
    once and reused for both the max and the final filter via a
    self-agg; exact DECIMAL revenue makes the max well-defined."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    rev = li.groupBy("l_suppkey").agg(
        F.sum(revenue.cast("decimal(28,6)")).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("max_rev"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped: national market share — one nation's fraction of a
    region's purchase volume for one product family, per year, as a
    conditional-aggregate ratio. The full 6-table join chain keeps every
    dimension hop broadcast; only the final per-year agg is wide."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).cast(
        "decimal(28,6)"
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nat_vol).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
    )


Q8_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT o_orderdate, n2.n_name AS supp_nation,
         CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6)) AS vol
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
)
GROUP BY 1
"""


def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped (adapted): priority counts for late-shipped lines.

    The testdata lineitem has no l_shipmode/l_commitdate/l_receiptdate
    (reference schema gap documented in COVERAGE.md), so "late" is
    l_shipdate > o_orderdate + 60 days and the group key is
    l_linestatus — the CASE-count-by-priority plan shape is identical."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: customer order-count distribution — LEFT OUTER
    join with a predicate inside the ON clause (so zero-order customers
    survive with count 0), then a two-level aggregation (count per
    customer, then histogram of those counts)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped: correlated per-key average — revenue from lines
    whose quantity is under 20% of that part's average quantity. The
    correlated subquery becomes a per-part aggregate joined back
    (both sides broadcast: only the brand's parts survive). The
    comparison qty < 0.2*avg is algebraically rewritten 5*qty*cnt <
    sum_qty so it is exact DECIMAL on both engines (no double-avg ulp
    flips at the boundary)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load_table(spark, sf_dir, "lineitem").join(
        p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey")
    )
    stats = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(D2)).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(stats, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity").cast(D2) * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(D2)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
WITH l AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
), s AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty, COUNT(*) AS cnt
  FROM l GROUP BY 1
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM l JOIN s ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped (adapted): suppliers who were the ONLY late
    shipper in a multi-supplier order. "Late" is l_shipdate >
    o_orderdate + 60 days (no l_receiptdate/l_commitdate in the
    testdata schema).

    The EXISTS (another supplier in the order) + NOT EXISTS (another
    LATE supplier) pair is decorrelated into ONE pass over lineitem
    instead of two self-joins: per (order, supplier) count the late
    rows, then per-order supplier counts as windows over the same
    partitioning; a waiting supplier is a late (order, supplier) in an
    order with >= 2 suppliers and exactly 1 late one. The explicit
    ``repartition(l_orderkey)`` makes BOTH the (l_orderkey, l_suppkey)
    groupBy and the l_orderkey windows reuse a single exchange
    (HashPartitioning on a subset satisfies the grouping's clustered
    distribution), so the plan is one lineitem scan + one shuffle —
    plan-pinned in tests/test_plans.py; the naive self-join plan reads
    lineitem three times and shuffles it twice (measured 3x end-to-end
    at sf0.1, widening with scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lif = li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_supp = (
        lif.repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(is_late, 1).otherwise(0)).alias("n_late_rows"))
    )
    w = W.partitionBy("l_orderkey")
    waiting = (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_late_supp",
            F.sum(F.when(F.col("n_late_rows") > 0, 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("n_late_rows") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        waiting.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").cast("long").alias("numwait"))
    )


Q21_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
"""


def q11_important_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped (adapted): groups whose value exceeds a fraction
    of the GLOBAL total — HAVING SUM(...) > scalar-subquery * fraction.
    No partsupp table in the testdata, so "value" is per-part discounted
    revenue from lineitem. The global total is a 1-row broadcast; the
    threshold compare is exact (value * 2000 > total in DECIMAL) so no
    double-ulp boundary flips.

    The per-part aggregate is PERSISTED so the fact table is scanned and
    shuffled ONCE: without it the total's scalar branch re-plans the
    whole groupBy (exchange-reuse does not canonicalize across the
    broadcast boundary here — the r7 sf1 sweep measured this entry at
    6.34× for 10× data, i.e. two fact passes). The cached table is
    part-grain (∝ distinct parts, never events), and the terminal-action
    owner releases it per the cache-lifetime contract
    (session.release_caches). r7 measured: sf0.1 ~unchanged (both
    passes are cheap there), sf1 8.6 → 1.5s — 10× data now ~1.1× wall."""
    li = load_table(spark, sf_dir, "lineitem")
    val = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).cast(
        "decimal(28,6)"
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(val).alias("value")).persist()
    total = per_part.agg(F.sum("value").alias("total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") * 2000 > F.col("total"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice*(1-l_discount), 6) AS DECIMAL(28,6))) AS value
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM per_part
WHERE value * 2000 > (SELECT SUM(value) FROM per_part)
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped (adapted): distinct-supplier counts per part
    attribute triple, excluding a NOT-IN supplier set. No partsupp
    table, so the part↔supplier relation is distinct (l_partkey,
    l_suppkey) pairs from lineitem; the "complaints" exclusion set is
    suppliers with negative account balance, applied as a broadcast
    left-anti join (NULL-safe, unlike a naive NOT IN)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_sk")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(bad, pairs.l_suppkey == F.col("bad_sk"), "left_anti")
        .join(p, pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,9,13,17,21,25,29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def q20_excess_share_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped (adapted): suppliers qualified by a nested
    aggregate threshold — here, suppliers providing >20% of total shipped
    quantity for some part in a name-filtered family (no partsupp
    availqty in the testdata). IN-subquery chain becomes per-(supp,part)
    agg → join per-part totals → exact 5*qty > total compare →
    left-semi into supplier. Share compare is exact DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    fam = li.join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    per_sp = fam.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(D2)).alias("sp_qty")
    )
    per_part = fam.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(D2)).alias("part_qty")
    )
    dominant = (
        per_sp.join(per_part, per_sp.l_partkey == F.col("pk"))
        .filter(F.col("sp_qty") * 5 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
    )


Q20_SQL = """
WITH fam AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
), per_sp AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sp_qty
  FROM fam GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS part_qty
  FROM fam GROUP BY 1
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_sp JOIN per_part ON l_partkey = pk
  WHERE sp_qty * 5 > part_qty
)
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped (adapted): the correlated-extremum join — for each
    qualifying part, the region's supplier(s) with the maximum account
    balance among suppliers that actually shipped it (no partsupp
    ps_supplycost in the testdata; max s_acctbal stands in for min
    supplycost). The correlated subquery is a per-part max joined back
    on equality — exact because max is a selection, not arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "ECONOMY")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pairs = (
        li.join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = pairs.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.max("s_acctbal").alias("max_bal")
    )
    return (
        pairs.join(
            best,
            (pairs.l_partkey == F.col("pk")) & (pairs.s_acctbal == F.col("max_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "l_partkey")
    )


Q2_SQL = """
WITH sn AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size = 5 AND p_type = 'ECONOMY'
)
SELECT s_acctbal, s_name, n_name, l_partkey
FROM pairs JOIN sn ON l_suppkey = s_suppkey
WHERE s_acctbal = (
  SELECT MAX(s2.s_acctbal)
  FROM pairs p2 JOIN sn s2 ON p2.l_suppkey = s2.s_suppkey
  WHERE p2.l_partkey = pairs.l_partkey
)
"""


Q22_SEGMENTS = ("BUILDING", "AUTOMOBILE", "MACHINERY")
# dormancy window start: non-empty at every test SF (5/32/395 rows at
# sf0.001/0.01/0.1) so the anti-join path is actually exercised
Q22_DORMANT_CUTOFF = "2000-01-01"


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: scalar subquery + anti join. Customers in target
    segments with above-average balance (threshold = a 1-row broadcast,
    computed as exact DECIMAL sum / count so both engines agree) with no
    RECENT order (left-anti against orders filtered to the dormancy
    window) — the "sales opportunity" set. The date filter pushes to the
    orders scan and the anti join's build side only needs o_custkey, so
    the build stays narrow AND small. (The classic never-ordered predicate
    is vacuous on this dataset — every customer has ordered — so the
    dormancy cutoff keeps the Q22 shape while exercising the anti join on
    a non-empty result; driver checks >0 rows at sf0.01.)"""
    c = load_table(spark, sf_dir, "customer")
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(D2)).cast("double")
                / F.count(F.lit(1))
            ).alias("thr")
        )
    )
    eligible = (
        c.filter(F.col("c_mktsegment").isin(*Q22_SEGMENTS))
        .join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(Q22_DORMANT_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    never_ordered = eligible.join(o, eligible.c_custkey == o.o_custkey, "left_anti")
    return never_ordered.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast(D2)).cast("double").alias("totacctbal"),
    )


Q22_SQL = f"""
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_mktsegment IN {Q22_SEGMENTS!r}
  AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_DORMANT_CUTOFF}')
GROUP BY c_mktsegment
"""


def bag_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag (multiset) semantics, preserving
    multiplicities (SURVEY §2.6 engine surface; plain set ops live in
    set_operations): part keys shipped under returnflag R vs linestatus F,
    with duplicates kept, bounded to a small key range.

    r9 shape: ONE scan, ONE shuffle. Spark's own optimizer rewrites each
    INTERSECT ALL / EXCEPT ALL into a count-aggregate + replication
    generate (RewriteIntersectAll / RewriteExceptAll) — but calling the
    two operators on shared inputs re-runs that rewrite per operator,
    which cost FOUR lineitem scans and two aggregation exchanges here.
    This entry applies the identical rewrite once by hand: per-key
    multiplicities of both sides off a single pass, then
    ``sequence``-explode to min(cr, cf) rows (bag intersection) and
    max(cr − cf, 0) rows (bag difference) — the exact multiset
    semantics, byte-identical rows, 1/4 the I/O at any scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    counts = li.groupBy("l_partkey").agg(
        F.count_if(F.col("l_returnflag") == "R").alias("cr"),
        F.count_if(F.col("l_linestatus") == "F").alias("cf"),
    )
    buckets = F.explode(
        F.array(
            F.struct(
                F.least("cr", "cf").alias("n"), F.lit("both_bag").alias("bucket")
            ),
            F.struct(
                F.greatest(F.col("cr") - F.col("cf"), F.lit(0)).alias("n"),
                F.lit("r_minus_f_bag").alias("bucket"),
            ),
        )
    )
    return (
        counts.select("l_partkey", buckets.alias("e"))
        .filter(F.col("e.n") > 0)
        .select(
            "l_partkey",
            F.explode(F.sequence(F.lit(1), F.col("e.n"))).alias("_i"),
            F.col("e.bucket").alias("bucket"),
        )
        .select("l_partkey", "bucket")
    )


BAG_SET_OPS_SQL = """
WITH r AS (SELECT l_partkey FROM lineitem WHERE l_partkey < 200 AND l_returnflag = 'R'),
     f AS (SELECT l_partkey FROM lineitem WHERE l_partkey < 200 AND l_linestatus = 'F')
SELECT l_partkey, 'both_bag' AS bucket FROM (SELECT * FROM r INTERSECT ALL SELECT * FROM f)
UNION ALL
SELECT l_partkey, 'r_minus_f_bag' AS bucket FROM (SELECT * FROM r EXCEPT ALL SELECT * FROM f)
"""


def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value (SURVEY §2.6 engine surface; the rank family
    lives in ranking_functions): per-nation account-balance distribution
    position and the nation's 2nd-lowest balance beside each supplier.
    Ordering carries a unique tie-break so both functions are
    deterministic."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
        F.nth_value("s_acctbal", 2).over(w_full).alias("second_lowest_bal"),
    )


WINDOW_DIST_SQL = """
SELECT s_suppkey, s_nationkey,
       ROUND(cume_dist() OVER (PARTITION BY s_nationkey
                               ORDER BY s_acctbal ASC, s_suppkey ASC), 6) AS bal_cume_dist,
       nth_value(s_acctbal, 2) OVER (PARTITION BY s_nationkey
                                     ORDER BY s_acctbal ASC, s_suppkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_lowest_bal
FROM supplier
"""


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt — the inverse of pivot (SURVEY §2.6 engine surface):
    part attributes to long (attr, val) form, one row per (part,
    attribute), numeric attrs cast to a common double."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    wide = p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return wide.unpivot("p_partkey", ["retailprice", "size"], "attr", "val")


UNPIVOT_SQL = """
SELECT p_partkey, attr, val
FROM (
  SELECT p_partkey,
         CAST(p_retailprice AS DOUBLE) AS retailprice,
         CAST(p_size AS DOUBLE) AS size
  FROM part WHERE p_partkey < 100
) UNPIVOT (val FOR attr IN (retailprice, size))
"""


QUERIES: dict[str, QueryDef] = {
    "q1_pricing_summary": QueryDef(q1_pricing_summary, Q1_SQL, "TPC-H Q1-shaped agg (A1)"),
    "q4_order_priority": QueryDef(q4_order_priority, Q4_SQL, "Q4-shaped EXISTS semi-join"),
    "q6_forecast_revenue": QueryDef(q6_forecast_revenue, Q6_SQL, "Q6-shaped pushdown scan-agg"),
    "q7_volume_shipping": QueryDef(q7_volume_shipping, Q7_SQL, "Q7-shaped dual-nation join"),
    "q9_product_profit": QueryDef(q9_product_profit, Q9_SQL, "Q9-shaped profit rollup"),
    "q14_promo_revenue": QueryDef(q14_promo_revenue, Q14_SQL, "Q14-shaped conditional-agg ratio"),
    "q15_top_supplier": QueryDef(q15_top_supplier, Q15_SQL, "Q15-shaped view + scalar max"),
    "q2_min_cost_supplier": QueryDef(q2_min_cost_supplier, Q2_SQL, "Q2-shaped correlated extremum"),
    "q8_market_share": QueryDef(q8_market_share, Q8_SQL, "Q8-shaped market-share ratio"),
    "q11_important_volume": QueryDef(q11_important_volume, Q11_SQL, "Q11-shaped having-vs-global"),
    "q12_late_priority": QueryDef(q12_late_priority, Q12_SQL, "Q12-shaped CASE-count by status"),
    "q13_customer_distribution": QueryDef(q13_customer_distribution, Q13_SQL, "Q13-shaped outer-join histogram"),
    "q16_supplier_count": QueryDef(q16_supplier_count, Q16_SQL, "Q16-shaped distinct-count + NOT IN"),
    "q17_small_quantity_revenue": QueryDef(q17_small_quantity_revenue, Q17_SQL, "Q17-shaped correlated avg"),
    "q20_excess_share_supplier": QueryDef(q20_excess_share_supplier, Q20_SQL, "Q20-shaped nested-agg semi-join"),
    "q21_waiting_supplier": QueryDef(q21_waiting_supplier, Q21_SQL, "Q21-shaped exists + not-exists"),
    "q19_discounted_revenue": QueryDef(q19_discounted_revenue, Q19_SQL, "Q19-shaped OR-of-ANDs join"),
    "q22_sales_opportunity": QueryDef(q22_sales_opportunity, Q22_SQL, "Q22-shaped scalar-subquery + anti-join"),
    "q10_returned_items": QueryDef(q10_returned_items, Q10_SQL, "Q10-shaped returned items"),
    "q18_large_orders": QueryDef(q18_large_orders, Q18_SQL, "Q18-shaped having+join-back"),
    "q3_shipping_priority": QueryDef(q3_shipping_priority, Q3_SQL, "Q3-shaped 3-way join"),
    "q5_region_revenue": QueryDef(q5_region_revenue, Q5_SQL, "Q5-shaped star join"),
    "scan_project_filter": QueryDef(scan_project_filter, SCAN_PROJECT_FILTER_SQL, "S5/P3 pushdown"),
    "drop_columns": QueryDef(drop_columns, DROP_COLUMNS_SQL, "P1 column drop"),
    "limit_topk": QueryDef(limit_topk, LIMIT_TOPK_SQL, "P5 ordered limit"),
    "count_rows": QueryDef(count_rows, COUNT_ROWS_SQL, "P6 count"),
    "guarded_division": QueryDef(guarded_division, GUARDED_DIVISION_SQL, "D1 guard"),
    "dropna_funnel": QueryDef(dropna_funnel, DROPNA_FUNNEL_SQL, "P2 dropna funnel"),
    "derived_columns": QueryDef(derived_columns, DERIVED_COLUMNS_SQL, "D2/D3/D7 features"),
    "decode_innings_pitched": QueryDef(decode_ip_query, DECODE_IP_SQL, "D6 base-3 decode"),
    "date_arithmetic": QueryDef(date_arithmetic, DATE_ARITHMETIC_SQL, "D9 dates"),
    "string_functions": QueryDef(string_functions, STRING_FUNCTIONS_SQL, "D8/D10 strings"),
    "try_cast_null_on_error": QueryDef(try_cast_null_on_error, TRY_CAST_SQL, "D11 casts"),
    "broadcast_dim_join": QueryDef(broadcast_dim_join, BROADCAST_DIM_JOIN_SQL, "J1/J2"),
    "first_match_lookup": QueryDef(first_match_lookup, FIRST_MATCH_SQL, "J1 tie-break"),
    "semi_anti_join": QueryDef(semi_anti_join, SEMI_ANTI_SQL, "semi/anti joins"),
    "asof_prior_stats": QueryDef(asof_prior_stats, ASOF_PRIOR_SQL, "J4 as-of window"),
    "merge_upsert": QueryDef(merge_upsert, MERGE_UPSERT_SQL, "J3/S9 MERGE emulation"),
    "summary_stats": QueryDef(summary_stats, SUMMARY_STATS_SQL, "A1 describe"),
    "histogram_binning": QueryDef(histogram_binning, HISTOGRAM_SQL, "A2 histogram"),
    "max_by_leaderboard": QueryDef(max_by_leaderboard, MAX_BY_SQL, "A4 max-by"),
    "string_agg_digest": QueryDef(string_agg_digest, STRING_AGG_SQL, "A5/D10 digest"),
    "confusion_matrix_metrics": QueryDef(confusion_matrix_metrics, CONFUSION_SQL, "A6 metrics"),
    "topk_per_group": QueryDef(topk_per_group, TOPK_PER_GROUP_SQL, "top-k window"),
    "lag_lead_sequence": QueryDef(lag_lead_sequence, LAG_LEAD_SQL, "lag/lead"),
    "set_operations": QueryDef(set_operations, SET_OPS_SQL, "set ops"),
    "bag_set_operations": QueryDef(bag_set_operations, BAG_SET_OPS_SQL, "bag set ops (ALL)"),
    "window_distribution_functions": QueryDef(
        window_distribution_functions, WINDOW_DIST_SQL, "cume_dist + nth_value"
    ),
    "unpivot_melt": QueryDef(unpivot_melt, UNPIVOT_SQL, "unpivot/melt (inverse pivot)"),
    "rollup_aggregation": QueryDef(rollup_aggregation, ROLLUP_SQL, "rollup"),
    "distinct_count": QueryDef(distinct_count, DISTINCT_COUNT_SQL, "count distinct"),
    "pivot_wide": QueryDef(pivot_wide, PIVOT_SQL, "pivot"),
}
