"""Operational / pipeline-analytics catalog entries.

The ops a production data platform runs *around* its queries: time-series
gap-fill + forward-fill (resampling), snapshot reconciliation (table diff),
key-skew profiling (the input to salting decisions in ``operators.skew``),
join-cardinality estimation (join sizing WITHOUT executing the join — the
statistic a cost-based planner needs), equal-frequency discretization, and
windowed z-score anomaly flagging.

All pure DataFrame compositions (no UDFs, no collect); every entry is
DuckDB-oracle-checked. Scale notes per entry docstring — the common theme
is that each op is one or two hash aggregations over keys, never a scan
the optimizer can't prune.

Reference tie-in: the reference's ETL reconciles yesterday's rows by
re-fetching and UPDATE-ing them (src/function.py:462-539) and handles
reschedule duplicates by PK failure (src/function.py:624-636);
``table_diff_reconcile`` is that capability as a set operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalars import stable_round
from ..operators.indexing import exact_ntile
from ..session import load_table
from .base import QueryDef, sround

D2 = "decimal(18,2)"

RESAMPLE_USER_CAP = 50


def time_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill a per-user daily series to a dense calendar and
    forward-fill missing days (time-series resampling: the `asfreq` +
    `ffill` of pandas, distributed). ``sequence(min_day, max_day)`` builds
    each user's calendar (array, exploded map-side — no join against a
    generated dimension), then one window per user carries the last
    observed value forward. At scale the state per user is one row; the
    explode output is bounded by (span_days x users) and partitions by
    user naturally."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < RESAMPLE_USER_CAP)
    daily = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast(D2)).alias("day_value")
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("day_value", ignorenulls=True).over(w).cast("double").alias("value"),
            F.col("day_value").isNull().alias("is_filled"),
        )
    )


TIME_RESAMPLE_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS day_value
  FROM events WHERE user_id < {RESAMPLE_USER_CAP}
  GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1
), grid AS (
  SELECT user_id, CAST(UNNEST(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
)
SELECT g.user_id, g.day,
       CAST(LAST_VALUE(d.day_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS value,
       d.day_value IS NULL AS is_filled
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
"""


def time_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill (pandas ``interpolate('linear')``,
    distributed) — the numeric sibling of ``time_resample_ffill``: each
    user's daily series is densified to a calendar grid and interior
    gaps get the straight line between the surrounding observations,
    ``v = prev + (next−prev)·(d−d_prev)/(d_next−d_prev)``; leading edges
    carry the first observation back, trailing edges carry the last
    forward (min/max span endpoints are observed days, so both exist).

    Two windows per user over the SAME partitioning (one exchange): a
    backward pass (last non-null value + its day) and a forward pass
    (first non-null value + its day) — per-user state is one row each
    way, the classic distributed gap-fill. Observed days reduce to the
    identity (prev==next==current), so the interpolation expression is
    total: no CASE on observation status is needed beyond the fill
    flag."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < RESAMPLE_USER_CAP)
    daily = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast(D2)).cast("double").alias("day_value")
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    g = grid.join(daily, ["user_id", "day"], "left")
    wb = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    wf = W.partitionBy("user_id").orderBy("day").rowsBetween(0, W.unboundedFollowing)
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    prev_v = F.last("day_value", ignorenulls=True).over(wb)
    prev_d = F.last(obs_day, ignorenulls=True).over(wb)
    next_v = F.first("day_value", ignorenulls=True).over(wf)
    next_d = F.first(obs_day, ignorenulls=True).over(wf)
    span = F.datediff(next_d, prev_d)
    interp = F.when(F.col("day_value").isNotNull(), F.col("day_value")).otherwise(
        F.when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(
            prev_v + (next_v - prev_v) * F.datediff(F.col("day"), prev_d) / span
        )
    )
    return g.select(
        "user_id",
        "day",
        stable_round(interp, 6).alias("value"),
        F.col("day_value").isNull().alias("is_filled"),
    )


TIME_INTERPOLATE_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events WHERE user_id < {RESAMPLE_USER_CAP}
  GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1
), grid AS (
  SELECT user_id, CAST(UNNEST(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
), hinged AS (
  SELECT g.user_id, g.day, d.day_value,
         LAST_VALUE(d.day_value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         LAST_VALUE(CASE WHEN d.day_value IS NOT NULL THEN g.day END IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
         FIRST_VALUE(d.day_value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         FIRST_VALUE(CASE WHEN d.day_value IS NOT NULL THEN g.day END IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
  FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
)
SELECT user_id, day,
       ROUND(CASE
         WHEN day_value IS NOT NULL THEN day_value
         WHEN prev_v IS NULL THEN next_v
         WHEN next_v IS NULL THEN prev_v
         ELSE prev_v + (next_v - prev_v) * datediff('day', prev_d, day)
                       / datediff('day', prev_d, next_d)
       END * 1e6) / 1e6 AS value,
       day_value IS NULL AS is_filled
FROM hinged
"""


def filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``FILTER (WHERE ...)`` conditional aggregation (SQL:2003
    T612 — the standard spelling of "pivot a few predicates into
    columns"; both engines support the clause, so the oracle text is
    dialect-common and pinned tri-modal in tests/test_sql_surface.py).
    The DataFrame dual is the when()-null idiom — aggregates skip nulls,
    so ``sum(when(p, x))`` ≡ ``SUM(x) FILTER (WHERE p)`` including the
    empty-group → NULL edge. One partial-aggregated groupBy; every
    conditional is computed in the same pass (no per-predicate scans)."""
    o = load_table(spark, sf_dir, "orders")
    finished = F.col("o_orderstatus") == "F"
    opened = F.col("o_orderstatus") == "O"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(finished, 1)).cast("long").alias("n_finished"),
        F.sum(F.when(finished, F.col("o_totalprice").cast(D2)))
        .cast("double")
        .alias("finished_price"),
        F.max(F.when(opened, F.col("o_totalprice"))).alias("max_open_price"),
    )


FILTERED_AGG_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_price,
       MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS max_open_price
FROM orders GROUP BY o_orderpriority
"""


def table_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two versions of ``orders`` into
    added / removed / changed rows (the engine-level form of the
    reference's per-row UPDATE + PK-violation reschedule handling,
    src/function.py:462-539,624-636). One full-outer hash join on the key;
    unchanged rows are dropped so the output is the changeset, which is
    what an incremental consumer replays. At 100 TB both snapshots
    shuffle-partition on the same key (co-partitioned diff); comparing a
    row-hash instead of each column keeps the shuffle narrow."""
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        F.col("o_totalprice").alias("old_price"),
        F.col("o_orderstatus").alias("old_status"),
    )
    new = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        (
            F.col("o_totalprice").cast(D2)
            + F.when(F.col("o_orderkey") % 5 == 0, F.lit(1)).otherwise(F.lit(0)).cast(D2)
        ).cast("double").alias("new_price"),
        F.col("o_orderstatus").alias("new_status"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_price").isNull(), F.lit("added"))
        .when(F.col("new_price").isNull(), F.lit("removed"))
        .when(
            (F.col("old_price") != F.col("new_price"))
            | (F.col("old_status") != F.col("new_status")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select("o_orderkey", change.alias("change_type"), "old_price", "new_price")
        .filter(F.col("change_type") != "unchanged")
    )


TABLE_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice AS old_price, o_orderstatus AS old_status
  FROM orders WHERE o_orderkey % 10 != 0
), new AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2))
              + CAST(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END AS DECIMAL(18,2)) AS DOUBLE) AS new_price,
         o_orderstatus AS new_status
  FROM orders WHERE o_orderkey % 7 != 0
), j AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         old_price, old_status, new_price, new_status
  FROM old FULL OUTER JOIN new USING (o_orderkey)
)
SELECT o_orderkey,
       CASE WHEN old_price IS NULL THEN 'added'
            WHEN new_price IS NULL THEN 'removed'
            WHEN old_price != new_price OR old_status != new_status THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       old_price, new_price
FROM j
WHERE CASE WHEN old_price IS NULL THEN 'added'
           WHEN new_price IS NULL THEN 'removed'
           WHEN old_price != new_price OR old_status != new_status THEN 'changed'
           ELSE 'unchanged' END != 'unchanged'
"""


SKEW_TOPK = 10


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution profile for join/agg planning: the top-K heaviest
    keys with their share of all rows — exactly the statistic that decides
    whether ``operators.skew.salted_join`` (or AQE skew split) is needed,
    computed as one hash agg over the key + a broadcast of the scalar
    total (no single-partition window)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_rows",
            stable_round(F.col("n_rows") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), "user_id")
        .limit(SKEW_TOPK)
    )


KEY_SKEW_SQL = f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1
), total AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM counts
)
SELECT user_id, n_rows,
       (ROUND(CAST(n_rows AS DOUBLE) / total * 1e6) / 1e6) AS share
FROM counts, total
ORDER BY n_rows DESC, user_id
LIMIT {SKEW_TOPK}
"""


def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join sizing WITHOUT executing the join: |A ⋈ B| on an equi-key is
    exactly ``SUM_k cnt_A(k) * cnt_B(k)`` over the two per-key count
    tables — two hash aggs and a join between the (far smaller) key-count
    tables. This is the statistic a cost-based planner (or a human sizing
    shuffle partitions for a 100 TB join) needs before committing to a
    plan; the per-key tables are the same aggregates a skew profile uses."""
    o = load_table(spark, sf_dir, "orders").groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_o")
    )
    li = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_l")
    )
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    return j.agg(
        F.sum(F.col("n_o") * F.col("n_l")).alias("est_join_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.max(F.col("n_o") * F.col("n_l")).alias("max_key_fanout"),
    )


JOIN_CARD_SQL = """
WITH o AS (
  SELECT o_orderkey, COUNT(*) AS n_o FROM orders GROUP BY 1
), l AS (
  SELECT l_orderkey, COUNT(*) AS n_l FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(n_o * n_l) AS BIGINT) AS est_join_rows,
       COUNT(*) AS n_matching_keys,
       CAST(MAX(n_o * n_l) AS BIGINT) AS max_key_fanout
FROM o JOIN l ON o_orderkey = l_orderkey
"""


N_BINS = 10


def quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization of ``o_totalprice`` into deciles:
    per-bin row count and [min, max] boundary. Exact ``ntile`` requires a
    total order (deterministic tie-break on the key), but the naive
    ``ntile().over(orderBy(...))`` collapses the table into ONE partition
    — a single-task sort of the universe at 100 TB. Instead: the
    range-partitioned dense global index (``dense_global_index``: range
    shuffle → partition-local row_number → broadcast offset join), then
    the exact NTILE bucket from arithmetic on the 0-based index. NTILE(k)
    over n rows puts ``q+1`` rows in each of the first ``r`` buckets and
    ``q`` in the rest (q = n div k, r = n mod k) — note ``floor(idx*k/n)``
    is NOT the same split when k does not divide n. ``n`` is one count()
    scan; the only driver-side data is that scalar plus the per-partition
    offsets inside dense_global_index. At 100 TB the *approximate* scale
    path is boundary assignment from the mergeable quantile sketch
    (``approx_percentiles`` / ``kll_quantile_rollup``) — this entry is the
    exact oracle those sketches are tested against."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    # n=None (r13): the exact-NTILE arithmetic derives n from the
    # operator's own offsets collect — the separate count() scan is gone.
    binned = exact_ntile(o, ["o_totalprice", "o_orderkey"], None, N_BINS, "bin_i").select(
        "o_totalprice", F.col("bin_i").cast("bigint").alias("bin")
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


QUANTILE_BIN_SQL = f"""
WITH binned AS (
  SELECT o_totalprice,
         NTILE({N_BINS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders
)
SELECT bin, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM binned GROUP BY 1
"""


GAP_THRESHOLD_SEC = 3600


def freshness_gap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness / outage detection (the pipeline-monitoring query a
    continuously-loaded warehouse runs on itself): per event type, find
    ingestion gaps longer than {GAP_THRESHOLD_SEC}s between consecutive
    events — each one a window where the upstream feed was silent. One
    lag window per type (single hash exchange on the type key; at 100 TB
    partition-prune to the trailing day first — gaps older than the
    freshness SLA are history, not alerts) plus a tiny rollup: gap
    count, worst gap, and the last-seen timestamp per type."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double"), 1).over(w)
    gapped = e.select("event_type", "ts", gap.alias("gap_sec"))
    return gapped.groupBy("event_type").agg(
        F.sum(F.when(F.col("gap_sec") > GAP_THRESHOLD_SEC, 1).otherwise(0))
        .cast("long")
        .alias("n_gaps"),
        stable_round(F.max("gap_sec"), 3).alias("max_gap_sec"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
    )


FRESHNESS_GAP_SQL = f"""
WITH gapped AS (
  SELECT event_type, ts,
         epoch(ts) - LAG(epoch(ts)) OVER (
           PARTITION BY event_type ORDER BY ts ASC, event_id ASC
         ) AS gap_sec
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN gap_sec > {GAP_THRESHOLD_SEC} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gaps,
       (ROUND(MAX(gap_sec) * 1e3) / 1e3) AS max_gap_sec,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
FROM gapped GROUP BY event_type
"""


Z_THRESHOLD = 2.0


def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed anomaly flagging: per event_type daily totals scored
    against that type's own mean/stddev; days with |z| above the threshold
    are the anomalies. Daily totals aggregate as DECIMAL (deterministic),
    the z-score is rounded (stddev merge order contributes ~1e-12 fuzz),
    and the threshold compares the ROUNDED score so both engines flag the
    identical day set. Two hash aggs; the per-type stats table is tiny and
    broadcast back onto the daily rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast(D2)).cast("double").alias("total")
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("total").alias("mu"), F.stddev_samp("total").alias("sigma")
    )
    z = stable_round((F.col("total") - F.col("mu")) / F.col("sigma"), 4)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select("event_type", "day", "total", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > Z_THRESHOLD)
    )


ZSCORE_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, AVG(total) AS mu, STDDEV_SAMP(total) AS sigma
  FROM daily GROUP BY 1
)
SELECT d.event_type, d.day, d.total,
       (ROUND((d.total - s.mu) / s.sigma * 1e4) / 1e4) AS zscore
FROM daily d JOIN stats s ON d.event_type = s.event_type
WHERE ABS(ROUND((d.total - s.mu) / s.sigma * 1e4) / 1e4) > {Z_THRESHOLD}
"""


def kl_divergence_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between corpus slices: KL(nation's order-priority
    mix ‖ global mix) per customer nation — the statistic a training-data
    pipeline monitors to catch a source whose composition shifted. Counts
    are exact integers, the ratios are single exact divisions, and the
    5-term Σ p·ln(p/q) is summed via a groupBy whose merge-order fuzz
    (~1e-16) is absorbed by rounding. Everything is two hash aggs and
    broadcast joins of tiny stat tables."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    enriched = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("n_name", "o_orderpriority")
    )
    # NOTE on the 4 branch re-scans: by_cell feeds three marginal aggs,
    # and without a persist each branch re-scans + re-joins orders. At
    # bench scale that is the FASTER plan (measured A/B: the persist's
    # materialization barrier costs more than rescanning an OS-cached
    # file); at 100 TB persist (or write) by_cell — ~nations x
    # priorities rows — so the fact is scanned once.
    by_cell = enriched.groupBy("n_name", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_cell")
    )
    by_nation = by_cell.groupBy("n_name").agg(F.sum("n_cell").alias("n_nation"))
    by_prio = by_cell.groupBy("o_orderpriority").agg(F.sum("n_cell").alias("n_prio"))
    total = by_cell.agg(F.sum("n_cell").alias("n_total"))
    p = F.col("n_cell") / F.col("n_nation")
    q = F.col("n_prio") / F.col("n_total")
    return (
        by_cell.join(F.broadcast(by_nation), "n_name")
        .join(F.broadcast(by_prio), "o_orderpriority")
        .crossJoin(F.broadcast(total))
        .groupBy("n_name")
        .agg(
            stable_round(F.sum(p * F.log(p / q)), 6).alias("kl_divergence"),
            F.max("n_nation").alias("n_orders"),
        )
    )


KL_DIVERGENCE_SQL = """
WITH cells AS (
  SELECT n_name, o_orderpriority, COUNT(*) AS n_cell
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), nat AS (
  SELECT n_name, CAST(SUM(n_cell) AS BIGINT) AS n_nation FROM cells GROUP BY 1
), prio AS (
  SELECT o_orderpriority, CAST(SUM(n_cell) AS BIGINT) AS n_prio FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_cell) AS BIGINT) AS n_total FROM cells
)
SELECT n_name,
       (ROUND(SUM((CAST(n_cell AS DOUBLE) / n_nation)
                  * LN((CAST(n_cell AS DOUBLE) / n_nation)
                       / (CAST(n_prio AS DOUBLE) / n_total))) * 1e6) / 1e6) AS kl_divergence,
       MAX(n_nation) AS n_orders
FROM cells
JOIN nat USING (n_name)
JOIN prio USING (o_orderpriority)
CROSS JOIN tot
GROUP BY 1
"""


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for every observed key
    (operators.sketches): the sketch is a ≤ depth×width-row DataFrame
    built in one map-side-combinable pass and broadcast to serve lookups —
    the mergeable scale path for heavy-hitter detection where the exact
    per-key aggregation (`key_skew_profile`) would itself be the skew
    problem. r10: promoted to a full DuckDB oracle via the operator's
    ``hash="md5"`` family (the repo's md5-conv integer hash over
    "<seed>:<key>") — a VERIFIABLE sketch: any engine with md5 can
    re-derive the identical cells and estimates, which is the audit
    property a cross-system count pipeline wants (the fast xxhash64
    family stays the operator default for corpus-scale builds). The CMS
    guarantee (never undercounts, overshoot ≤ 2N/width w.h.p.) is
    property-tested in tests/test_operators.py for BOTH hash families."""
    from ..operators.sketches import cms_build, cms_estimate

    e = load_table(spark, sf_dir, "events")
    sketch = cms_build(e, "user_id", hash="md5")
    probes = e.select("user_id").distinct()
    return cms_estimate(sketch, probes, "user_id", hash="md5").orderBy("user_id")


def _cms_sql() -> str:
    from ..operators.sketches import DEPTH, WIDTH

    bucket = (
        "CAST(concat('0x', substr(md5(CAST(seed AS VARCHAR) || ':' "
        "|| CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % {w}"
    ).format(w=WIDTH)
    return f"""
WITH seeds AS (SELECT UNNEST(range({DEPTH})) AS seed),
cells AS (
  SELECT seed, CAST({bucket} AS BIGINT) AS bucket
  FROM events CROSS JOIN seeds
), sketch AS (
  SELECT seed, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2
), pcells AS (
  SELECT user_id, seed, CAST({bucket} AS BIGINT) AS bucket
  FROM (SELECT DISTINCT user_id FROM events) CROSS JOIN seeds
)
SELECT user_id, MIN(COALESCE(n, 0)) AS est_count
FROM pcells LEFT JOIN sketch USING (seed, bucket)
GROUP BY user_id
"""


CMS_SQL = _cms_sql()


def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link analysis over the part co-purchase graph: parts appearing in
    the same order are bidirectionally linked; exactly 5 PageRank
    iterations (operators.graph — one edge join + one agg per step,
    localCheckpoint-truncated lineage) rank the graph's hub parts.
    FIXED-iteration contract (r10): the entry is DuckDB-oracle'd by a
    5-step unroll, so the operator's ``tol`` early-exit (r8 verdict #3,
    pytest-pinned on the operator) is deliberately NOT wired here — a
    faster-converging dataset would otherwise exit Spark-side at step 4
    and silently hash-mismatch the 5-step SQL dual. (On this graph the
    exit could never fire anyway: deltas decay ~7.1×/step and sit at
    5.5e-9 after step 5, just above the 1e-9 output quantum — and
    skipping the probe saves its piggybacked delta join, ~0.4s.)
    Top-20 by (rounded rank, part) for a
    bounded, deterministic result. r10: promoted from rows-only to full
    DuckDB hash parity — ``PAGERANK_SQL`` unrolls the 5 power-iteration
    steps into chained CTEs with op-for-op float-grain matching (the
    MMR-unroll move); the contraction damps the per-step ~1e-15
    fold-order drift, 10 orders below the 6dp output quantum."""
    from ..operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Edge build as ONE aggregation instead of a lineitem self-join (r12
    # optimization, guide §2.3/§2.4 "aggregate before you shuffle" /
    # "remove shuffles outright"): the self-join scanned lineitem twice
    # and exchanged it twice (both SMJ legs hash(l_orderkey), sorted),
    # where one partial-aggregable collect_set groupBy scans and shuffles
    # it once and emits the same within-order pairs map-side from the
    # per-order part array (collect_set dedups within the order; the
    # global dropDuplicates downstream dedups across orders either way,
    # so the resulting links table is IDENTICAL — asserted content-hash
    # equal and entry-rows equal in the r12 A/B; at sf0.1 flat-to-~8%
    # faster, at 100 TB one lineitem scan + shuffle instead of two).
    parts = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        parts.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    # checkpoint_every=2: two update steps per materialization job —
    # identical ranks (A/B-pinned), ~5% wall from halved scheduler and
    # checkpoint round-trips. tol=None (r10, review finding): the DuckDB
    # oracle unrolls EXACTLY 5 steps, so the entry must be a fixed-
    # iteration contract — with the probe wired, a faster-converging
    # dataset (delta < tol by step 4) would early-exit Spark-side and
    # silently hash-mismatch the 5-step SQL. The early-exit feature
    # stays on the OPERATOR (pytest-pinned); this entry just doesn't use
    # it, which also saves the probe's piggybacked delta join (~0.4s).
    ranks = pagerank(edges, iterations=5, tol=None, checkpoint_every=2)
    return (
        ranks.select("node", stable_round(F.col("rank") * 1000, 6).alias("rank_permille"))
        .orderBy(F.desc("rank_permille"), "node")
        .limit(20)
    )


def _pagerank_oracle_sql(iterations: int = 5) -> str:
    """DuckDB dual of ``pagerank_copurchase`` — the power iteration
    unrolled into ``iterations`` chained (contrib, rank) CTE pairs, the
    same promotion move as the r9 MMR unroll (queries/embeddings.py).

    Float-grain matching, op for op with ``operators.graph.pagerank``:
    the co-purchase graph is SYMMETRIC, so the dangling set is empty on
    both engines and Spark's ``+ damping·0.0/n`` term is an exact float
    no-op (omitted here); the base term evaluates ``(1 − 8.5e-1) / n``
    — the identical IEEE subtract-then-divide Spark's Python literal
    performs (scientific notation keeps DuckDB's literal a DOUBLE, not
    DECIMAL — queries/base.sround); each contribution is
    ``SUM(rank / deg)`` per dst (fold-order drift ~1e-15/step, damped by
    the contraction); the output rounds ``(rank * 1e3) * 1e6`` in that
    exact op order (stable_round of rank_permille). checkpoint_every
    only chains plans — values are iteration-count functions, so the
    unroll pins the Spark loop's checkpoint/early-exit plumbing too
    (tol=1e-9 never fires inside the 5-step cap on this graph)."""
    head = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
links AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, 1e0 / n AS rank FROM nodes CROSS JOIN nn)"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(
            f""",
c{i} AS (
  SELECT l.dst AS node, SUM(r.rank / l.deg) AS contrib
  FROM r{i - 1} r JOIN links l ON r.node = l.src GROUP BY l.dst
),
r{i} AS (
  SELECT nodes.node,
         (1 - 8.5e-1) / n + 8.5e-1 * COALESCE(c.contrib, 0e0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} c ON nodes.node = c.node
)"""
        )
    tail = f"""
SELECT node, (ROUND((rank * 1e3) * 1e6) / 1e6) AS rank_permille
FROM r{iterations}
ORDER BY rank_permille DESC, node ASC
LIMIT 20
"""
    return head + "".join(steps) + tail


PAGERANK_SQL = _pagerank_oracle_sql()


WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorize_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile capping (winsorization) per market segment: clip
    ``c_acctbal`` to that segment's exact [p05, p95] — the outlier
    treatment a feature pipeline applies before scaling (complement of
    the row-dropping `iqr_outlier_filter`). One percentile agg per group
    (tiny, broadcast back), then a pointwise clamp — no second shuffle.
    At 100 TB the bounds come from the mergeable sketch
    (`approx_percentiles`) instead of the exact percentile."""
    c = load_table(spark, sf_dir, "customer")
    bounds = c.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", WINSOR_LO).alias("lo"),
        F.percentile("c_acctbal", WINSOR_HI).alias("hi"),
    )
    return (
        c.join(F.broadcast(bounds), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi")).alias(
                "acctbal_winsorized"
            ),
            (F.col("c_acctbal") != F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))).alias("was_clipped"),
        )
    )


WINSORIZE_SQL = f"""
WITH bounds AS (
  SELECT c_mktsegment,
         quantile_cont(c_acctbal, {WINSOR_LO}) AS lo,
         quantile_cont(c_acctbal, {WINSOR_HI}) AS hi
  FROM customer GROUP BY 1
)
SELECT c_custkey, c_mktsegment, c_acctbal,
       LEAST(GREATEST(c_acctbal, lo), hi) AS acctbal_winsorized,
       c_acctbal != LEAST(GREATEST(c_acctbal, lo), hi) AS was_clipped
FROM customer JOIN bounds USING (c_mktsegment)
"""


def robust_scale_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR robust scaling per market segment — the outlier-immune
    alternative to z-score standardization (`standardize_per_group`),
    and the scaling step that usually follows `winsorize_per_group`.
    Same shape as winsorize: one exact-percentile agg per group (tiny,
    broadcast back), then a pointwise map — one shuffle total, and the
    (x−median)/IQR arithmetic is single exact double ops, so no rounding
    is needed for parity. At 100 TB the bounds come from the mergeable
    GK sketch (`approx_percentiles`) instead of the exact percentile."""
    c = load_table(spark, sf_dir, "customer")
    bounds = c.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", 0.5).alias("med"),
        F.percentile("c_acctbal", 0.25).alias("q1"),
        F.percentile("c_acctbal", 0.75).alias("q3"),
    )
    return c.join(F.broadcast(bounds), "c_mktsegment").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        (
            (F.col("c_acctbal") - F.col("med")) / (F.col("q3") - F.col("q1"))
        ).alias("acctbal_scaled"),
    )


ROBUST_SCALE_SQL = """
WITH bounds AS (
  SELECT c_mktsegment,
         quantile_cont(c_acctbal, 0.5)  AS med,
         quantile_cont(c_acctbal, 0.25) AS q1,
         quantile_cont(c_acctbal, 0.75) AS q3
  FROM customer GROUP BY 1
)
SELECT c_custkey, c_mktsegment, c_acctbal,
       (c_acctbal - med) / (q3 - q1) AS acctbal_scaled
FROM customer JOIN bounds USING (c_mktsegment)
"""


EWMA_TAPS = 16
EWMA_USER_CAP = 40


def ewma_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of per-user daily event
    counts — the trend-following smoother behind rate alerting and
    engagement scores. α=1/2 with a 16-tap truncated kernel, written as
    16 ``lag`` terms over ONE window: every weight is a power of two and
    every daily count a small integer, so each term — and the whole sum —
    is exactly representable in a double. The result is bit-identical on
    any engine and any evaluation order, which no float-weighted EWMA can
    claim; that is what makes this entry hash-checkable against the
    oracle with no rounding. One shuffle (window by user); the 16 lags
    share a single sort, and the kernel tail (2^-16) is far below any
    alerting threshold, so truncation is semantically free.

    The taps run over a DENSE calendar (each user's min..max day grid,
    gap days at count 0 — the ``time_resample_ffill`` densify idiom):
    lagging over observed rows only would SKIP decay across idle gaps —
    a user with one huge day a month ago would still carry a quarter of
    it, exactly when the alerting smoother must have cooled off."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < EWMA_USER_CAP)
    daily = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    dense = grid.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    w = W.partitionBy("user_id").orderBy("day")
    ewma = F.col("cnt").cast("double") * F.lit(0.5)
    for k in range(1, EWMA_TAPS):
        ewma = ewma + F.coalesce(F.lag("cnt", k).over(w), F.lit(0)).cast(
            "double"
        ) * F.lit(2.0 ** -(k + 1))
    return dense.select("user_id", "day", "cnt", ewma.alias("ewma_cnt"))


EWMA_SQL = (
    """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
  FROM events WHERE user_id < """
    + str(EWMA_USER_CAP)
    + """
  GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1
), grid AS (
  SELECT user_id, CAST(UNNEST(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
), dense AS (
  SELECT g.user_id, g.day, COALESCE(d.cnt, 0) AS cnt
  FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
)
SELECT user_id, day, cnt,
       cnt * CAST(0.5 AS DOUBLE)
"""
    + "".join(
        f"       + COALESCE(LAG(cnt, {k}) OVER w, 0) * CAST({2.0 ** -(k + 1)!r} AS DOUBLE)\n"
        for k in range(1, EWMA_TAPS)
    )
    + """       AS ewma_cnt
FROM dense
WINDOW w AS (PARTITION BY user_id ORDER BY day)
"""
)


WAU_WINDOW = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (the WAU curve).
    COUNT(DISTINCT) over a sliding window is not incrementally computable
    — a window-function form would keep every user id in frame state per
    row. The scale idiom instead REPLICATES each (user, day) observation
    to the ≤7 report days it can influence (map-side explode, ×7 fixed
    fan-out) and runs ONE distinct aggregation keyed (report_day, user):
    two ordinary hash shuffles, partial-aggregated, no per-row set state.
    Report days are clipped to the observed range so the curve has no
    lead-in ramp beyond the data's own span."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    obs = e.distinct()  # (user, day) grain is enough; drops event fan-in early
    span = obs.agg(F.max("day").alias("mx")).select("mx")
    reported = (
        obs.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", WAU_WINDOW - 1))
            ).alias("report_day"),
        )
        .crossJoin(F.broadcast(span))
        .filter(F.col("report_day") <= F.col("mx"))
    )
    return reported.groupBy("report_day").agg(
        F.count_distinct("user_id").alias("active_users")
    )


ROLLING_WAU_SQL = f"""
WITH obs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), span AS (
  SELECT MAX(day) AS mx FROM obs
), reported AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(CAST(day AS TIMESTAMP),
                                     CAST(day + INTERVAL {WAU_WINDOW - 1} DAY AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS report_day
  FROM obs
)
SELECT report_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM reported, span
WHERE report_day <= mx
GROUP BY 1
"""


MAU_WINDOW = 28


def user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU + STICKINESS per day (DAU/MAU — the engagement
    ratio product teams track beside the growth-accounting split): all
    three actives curves from ONE (user, day) observation table, each by
    the same replicate-don't-window idiom as ``rolling_active_users`` —
    a (user, day) row is exploded to the ≤1 / ≤7 / ≤{MAU_WINDOW} report
    days it can influence, tagged with the window length, and ONE
    distinct aggregation keyed (report_day, window, user) feeds a pivot
    to columns. Fan-out is a fixed ×36 on the deduped user-day grain
    (not events), so the plan is two hash shuffles at any corpus size;
    no per-row distinct-set window state anywhere. Stickiness rounded
    6dp; report days clipped to the observed span (no lead-in ramp)."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    obs = e.distinct()
    span = obs.agg(F.max("day").alias("mx")).select("mx")
    windows = F.array(
        *[F.lit(w) for w in (1, WAU_WINDOW, MAU_WINDOW)]
    )
    reported = (
        obs.select("user_id", "day", F.explode(windows).alias("win"))
        .select(
            "user_id",
            "win",
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", F.col("win") - 1))
            ).alias("report_day"),
        )
        .crossJoin(F.broadcast(span))
        .filter(F.col("report_day") <= F.col("mx"))
    )
    counts = reported.groupBy("report_day").agg(
        F.count_distinct(F.when(F.col("win") == 1, F.col("user_id"))).alias("dau"),
        F.count_distinct(
            F.when(F.col("win") == WAU_WINDOW, F.col("user_id"))
        ).alias("wau"),
        F.count_distinct(
            F.when(F.col("win") == MAU_WINDOW, F.col("user_id"))
        ).alias("mau"),
    )
    return counts.select(
        "report_day",
        "dau",
        "wau",
        "mau",
        stable_round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
            "stickiness"
        ),
    )


USER_STICKINESS_SQL = f"""
WITH obs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), span AS (
  SELECT MAX(day) AS mx FROM obs
), reported AS (
  SELECT user_id, w.win,
         CAST(UNNEST(generate_series(CAST(day AS TIMESTAMP),
                                     CAST(day + (w.win - 1) * INTERVAL 1 DAY AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS report_day
  FROM obs CROSS JOIN (VALUES (1), ({WAU_WINDOW}), ({MAU_WINDOW})) AS w(win)
), counts AS (
  SELECT report_day,
         COUNT(DISTINCT CASE WHEN win = 1 THEN user_id END) AS dau,
         COUNT(DISTINCT CASE WHEN win = {WAU_WINDOW} THEN user_id END) AS wau,
         COUNT(DISTINCT CASE WHEN win = {MAU_WINDOW} THEN user_id END) AS mau
  FROM reported, span
  WHERE report_day <= mx
  GROUP BY 1
)
SELECT report_day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       CAST(mau AS BIGINT) AS mau,
       ROUND(CAST(dau AS DOUBLE) / mau * 1e6) / 1e6 AS stickiness
FROM counts
"""


SAMPLE_K = 100


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling of the corpus, weight = document
    length (operators.sampling A-Res: key = u^(1/w), u from xxhash64 —
    re-runs and task retries produce the identical sample, which
    ``rand()``-based sampling cannot guarantee). Executes as
    TakeOrderedAndProject (per-partition heaps), never a full sort.
    Rows-only: the hash-derived keys are not SQL-portable."""
    from ..operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("double").alias("w")
    )
    return weighted_sample(d, "doc_id", "w", SAMPLE_K)


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP-style) of ``value`` per event type:
    each reading is weighted by how long it was "current" (until the
    next event of the same type), the irregular-sampling average a
    last-value-carried-forward sensor/price series needs — a plain AVG
    over-weights bursts.

    Determinism: durations are exact BIGINT microseconds
    (``unix_micros``/``epoch_us``), values go through DECIMAL(18,6), so
    the Σ(v·dur) / Σ(dur) fold is exact-integer/decimal on both engines
    regardless of partial-agg order; only the final divide is float,
    rounded 6dp. One shuffle (window by event_type, reused by the
    groupBy — same key)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    step = e.select(
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
        (F.lead(us).over(w) - us).alias("dur_us"),
    )
    return (
        step.filter(F.col("dur_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            stable_round(
                F.sum(F.col("v") * F.col("dur_us")).cast("double")
                / F.sum("dur_us").cast("double"),
                6,
            ).alias("twap"),
        )
    )


TWAP_SQL = """
WITH seq AS (
  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
         LEAD(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           - epoch_us(ts) AS dur_us
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
       (ROUND(CAST(SUM(v * dur_us) AS DOUBLE) / CAST(SUM(dur_us) AS DOUBLE) * 1e6) / 1e6) AS twap
FROM seq WHERE dur_us IS NOT NULL
GROUP BY event_type
"""


def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via bitmap aggregates (the
    exact-counting sibling of the HLL/theta sketch entries): per
    (type, day, bucket) user-id bitmaps (``bitmap_construct_agg`` over
    ``bitmap_bit_position``), rolled up two ways — daily distincts by
    summing per-bucket ``bitmap_count``, and the per-type TOTAL by
    ``bitmap_or_agg``-merging the daily bitmaps first. Unlike
    count-distinct, the bitmaps re-aggregate without rescanning facts —
    the materialized-rollup trick for exact DAU->MAU at 100 TB; unlike
    HLL they stay exact, at bitmap (not cardinality-constant) size.
    State per group is bounded: one 4KB bitmap per 32k-id bucket."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bk"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    per_day = daily.groupBy("event_type", "day").agg(
        F.sum(F.bitmap_count("bm")).alias("du")
    )
    days = per_day.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("du").cast("long").alias("max_daily_users"),
    )
    totals = (
        daily.groupBy("event_type", "bk")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("distinct_users"))
    )
    return totals.join(days, "event_type").select(
        "event_type", "distinct_users", "n_days", "max_daily_users"
    )


BITMAP_ROLLUP_SQL = """
WITH pd AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS du
  FROM events GROUP BY 1, 2
)
SELECT e.event_type, distinct_users, n_days, max_daily_users
FROM (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
      FROM events GROUP BY 1) e
JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(MAX(du) AS BIGINT) AS max_daily_users
      FROM pd GROUP BY 1) d USING (event_type)
"""


def benford_digit_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of ``events.value`` (the fraud/anomaly
    screen auditors run on transaction amounts): observed first-digit
    frequency vs the Benford expectation log10(1 + 1/d), with the
    per-digit chi-square contribution. Digit extraction is EXACT integer
    arithmetic — value scaled to micro-units (``round(v*1e6)`` as
    BIGINT, exact for this domain) and the first digit taken from the
    integer's string form, which is engine-identical (double→string
    formatting is NOT, and float log10/pow digit extraction can flip at
    power-of-ten boundaries by one ulp of libm). One map-only
    projection + a 9-group aggregate + a broadcast total."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    micro = F.round(F.col("value") * F.lit(1e6)).cast("bigint")
    # micro >= 1 guard: a value below 0.5e-6 would yield digit 0, whose
    # Benford expectation log10(1 + 1/0) is NULL on Spark (ANSI off)
    # but inf on DuckDB doubles — excluded identically on both engines
    d = e.select(micro.alias("micro")).filter(F.col("micro") >= 1).select(
        F.substring(F.col("micro").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("n_total"))
    obs = F.col("n").cast("double") / F.col("n_total")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        stable_round(obs, 6).alias("obs_freq"),
        stable_round(exp, 6).alias("benford_freq"),
        stable_round(
            (obs - exp) * (obs - exp) / exp * F.col("n_total"), 6
        ).alias("chi2_term"),
    )


BENFORD_SQL = f"""
WITH m AS (
  SELECT CAST(ROUND(value * 1e6) AS BIGINT) AS micro
  FROM events WHERE value > 0
), d AS (
  SELECT CAST(substr(CAST(micro AS STRING), 1, 1) AS INT) AS digit
  FROM m WHERE micro >= 1
), counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
), total AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS n_total FROM counts
)
SELECT digit, n,
       {sround("CAST(n AS DOUBLE) / n_total", 6)} AS obs_freq,
       {sround("LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE))", 6)} AS benford_freq,
       {sround(
           "(CAST(n AS DOUBLE) / n_total - LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)))"
           " * (CAST(n AS DOUBLE) / n_total - LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)))"
           " / LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * n_total", 6)} AS chi2_term
FROM counts, total
"""


RFM_BUCKETS = 3


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (the classic customer-value analytics rollup):
    per user, Recency = days since last event, Frequency = event count,
    Monetary = exact-decimal value sum; each dimension scored into
    terciles (ascending, tie-broken by user_id) and users rolled up per
    'R#F#M#' segment. The three tercile ranks each ride the
    range-partitioned ``dense_global_index`` — the user table can be
    10^8 rows at scale, so no one-task NTILE sort anywhere. Monetary is
    summed as DECIMAL (associative, partial-agg order-proof) so the
    rank ORDER is cross-engine identical — ranking on a double sum
    would let fold order flip near-tied users into different buckets."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.to_date("ts")).alias("mx"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff("mx", "last_day").alias("r_days"),
            "freq",
            "monetary",
        )
    )
    # r13: no cache, no count() — each tercile index derives n from its
    # own offsets collect (exact_ntile n=None), and the chain reads the
    # user-grain frame exactly once (the first dimension's lazy-
    # checkpoint job; dims 2/3 read the previous dimension's checkpoint
    # blocks), so the r11 cache had become a single-reader store.
    u = exact_ntile(u, ["r_days", "user_id"], None, RFM_BUCKETS, "r_score")
    u = exact_ntile(u, ["freq", "user_id"], None, RFM_BUCKETS, "f_score")
    u = exact_ntile(u, ["monetary", "user_id"], None, RFM_BUCKETS, "m_score")
    seg = F.concat(
        F.lit("R"),
        F.col("r_score").cast("string"),
        F.lit("F"),
        F.col("f_score").cast("string"),
        F.lit("M"),
        F.col("m_score").cast("string"),
    )
    return (
        u.select(seg.alias("segment"), "r_days", "freq", "monetary")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            stable_round(F.avg(F.col("r_days").cast("double")), 4).alias(
                "avg_recency_days"
            ),
            stable_round(F.avg(F.col("freq").cast("double")), 4).alias(
                "avg_frequency"
            ),
            stable_round(F.sum("monetary").cast("double"), 4).alias("total_monetary"),
        )
    )


RFM_SEGMENTS_SQL = f"""
WITH mx AS (
  SELECT MAX(CAST(ts AS DATE)) AS mx FROM events
), u AS (
  SELECT user_id,
         date_diff('day', MAX(CAST(ts AS DATE)), (SELECT mx FROM mx)) AS r_days,
         COUNT(*) AS freq,
         SUM(CAST(value AS DECIMAL(18,4))) AS monetary
  FROM events GROUP BY user_id
), scored AS (
  SELECT r_days, freq, monetary,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY r_days, user_id) AS r_score,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY freq, user_id) AS f_score,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY monetary, user_id) AS m_score
  FROM u
)
SELECT 'R' || CAST(r_score AS VARCHAR) || 'F' || CAST(f_score AS VARCHAR)
           || 'M' || CAST(m_score AS VARCHAR) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       {sround("AVG(CAST(r_days AS DOUBLE))", 4)} AS avg_recency_days,
       {sround("AVG(CAST(freq AS DOUBLE))", 4)} AS avg_frequency,
       {sround("CAST(SUM(monetary) AS DOUBLE)", 4)} AS total_monetary
FROM scored GROUP BY 1
"""


QUERIES: dict[str, QueryDef] = {
    "rfm_segments": QueryDef(
        rfm_segments,
        RFM_SEGMENTS_SQL,
        "ops: RFM customer segmentation (3x range-partitioned exact terciles)",
    ),
    "benford_digit_distribution": QueryDef(
        benford_digit_distribution,
        BENFORD_SQL,
        "ops: Benford first-digit conformance + chi-square (exact integer digit extraction)",
    ),
    "bitmap_distinct_rollup": QueryDef(
        bitmap_distinct_rollup,
        BITMAP_ROLLUP_SQL,
        "ops: exact mergeable distinct via bitmap aggregates (DAU->MAU rollup)",
    ),
    "time_weighted_avg": QueryDef(
        time_weighted_avg, TWAP_SQL, "ops: duration-weighted mean over irregular series"
    ),
    "kl_divergence_slices": QueryDef(
        kl_divergence_slices, KL_DIVERGENCE_SQL, "ops: KL distribution drift per slice"
    ),
    "cms_heavy_hitters": QueryDef(
        cms_heavy_hitters, CMS_SQL, "ops: count-min sketch frequency estimates"
    ),
    "pagerank_copurchase": QueryDef(
        pagerank_copurchase, PAGERANK_SQL, "ops: PageRank over part co-purchase graph"
    ),
    "winsorize_per_group": QueryDef(
        winsorize_per_group, WINSORIZE_SQL, "ops: percentile capping per group"
    ),
    "weighted_sample_docs": QueryDef(
        weighted_sample_docs, None, "ops: deterministic weighted sample (A-Res)"
    ),
    "time_resample_ffill": QueryDef(
        time_resample_ffill, TIME_RESAMPLE_SQL, "ops: calendar gap-fill + forward-fill"
    ),
    "time_interpolate_linear": QueryDef(
        time_interpolate_linear,
        TIME_INTERPOLATE_SQL,
        "ops: calendar gap-fill + linear interpolation (two-window pass)",
    ),
    "filtered_aggregates": QueryDef(
        filtered_aggregates,
        FILTERED_AGG_SQL,
        "ops: FILTER-clause conditional aggregation (ANSI, dialect-common)",
    ),
    "table_diff_reconcile": QueryDef(
        table_diff_reconcile, TABLE_DIFF_SQL, "ops: snapshot diff (added/removed/changed)"
    ),
    "key_skew_profile": QueryDef(
        key_skew_profile, KEY_SKEW_SQL, "ops: heavy-key skew profile"
    ),
    "join_cardinality_estimate": QueryDef(
        join_cardinality_estimate, JOIN_CARD_SQL, "ops: join sizing without the join"
    ),
    "quantile_binning": QueryDef(
        quantile_binning, QUANTILE_BIN_SQL, "ops: equal-frequency decile binning"
    ),
    "zscore_anomalies": QueryDef(
        zscore_anomalies, ZSCORE_SQL, "ops: windowed z-score anomaly flags"
    ),
    "freshness_gap_scan": QueryDef(
        freshness_gap_scan,
        FRESHNESS_GAP_SQL,
        "ops: ingestion-gap / data-freshness monitoring per event type",
    ),
    "robust_scale_per_group": QueryDef(
        robust_scale_per_group, ROBUST_SCALE_SQL, "ops: median/IQR robust scaling"
    ),
    "ewma_user_activity": QueryDef(
        ewma_user_activity, EWMA_SQL, "ops: exact dyadic-weight EWMA smoothing"
    ),
    "rolling_active_users": QueryDef(
        rolling_active_users, ROLLING_WAU_SQL, "ops: rolling 7-day distinct users (WAU)"
    ),
    "user_stickiness": QueryDef(
        user_stickiness,
        USER_STICKINESS_SQL,
        "ops: DAU/WAU/MAU + stickiness from one replicated user-day agg",
    ),
}
