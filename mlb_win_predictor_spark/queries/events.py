"""Event-stream query catalog (SURVEY.md §2.7 T1-T5, batch-equivalent).

The reference is a daily micro-batch pipeline whose streaming semantics
(scheduled trigger, late outcomes, dedup of rescheduled games, event-time
JSON log) map onto Structured Streaming; the *streaming* implementations
live in ``mlb_win_predictor_spark.streaming``. The catalog entries here are
the batch-equivalent event-time queries the DuckDB oracle can verify —
identical logical plans to the streaming versions minus the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import scalars as S
from ..session import load_table
from .base import QueryDef

DV = "decimal(18,2)"


def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — tumbling 1-day event-time window over the JSON event log
    (src/function.py:356-362 ISO-timestamped events). F.window() struct
    rendered as a string bucket so the oracle schema matches."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 day")
    return (
        e.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DV)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — sliding 2h window, 1h slide: each event lands in 2 buckets.
    Oracle reproduces the bucket-explosion with a 2-offset unnest."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "2 hours", "1 hour")
    return (
        e.groupBy(win)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )


SLIDING_SQL = """
WITH exploded AS (
  SELECT date_trunc('hour', ts) - INTERVAL (off) HOUR AS window_start
  FROM events, (SELECT UNNEST([0, 1]) AS off)
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events
FROM exploded GROUP BY 1
"""


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (SURVEY §2.7 engine surface): per-user sessions cut
    at >30 min inactivity via lag + cumulative gap counter — the batch
    dual of session_window(ts, '30 minutes')."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double"), 1).over(w)
    sess = (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn(
            "session_no",
            F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        S.stable_round(
            F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double")), 3
        ).alias("duration_sec"),
    )


SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       (ROUND((MAX(epoch(ts)) - MIN(epoch(ts))) * 1e3) / 1e3) AS duration_sec
FROM numbered GROUP BY user_id, session_no
"""


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions (SURVEY §2.3): the reference parses API JSON
    with dict access (src/function.py:83-85); engine dual is
    get_json_object over the events.props payload."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# TRY_CAST: the dual of Spark's ANSI-off null-on-error cast — a plain
# CAST would ABORT the oracle on a non-integer k (verified: DuckDB
# raises Conversion Error where Spark yields NULL). Residual divergence:
# a decimal-string k ('12.5') TRY_CASTs to 13 on DuckDB but NULL on
# Spark — currently impossible (generator emits integer k) and would
# fail parity loudly, not silently corrupt.
JSON_PROPS_SQL = """
SELECT event_type,
       COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))   AS max_k
FROM events GROUP BY event_type
"""


def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads via Spark 4's VariantType — the engine's
    native path for schema-on-read JSON (vs get_json_object string
    re-parsing in json_props_extract): parse once with try_parse_json
    (binary variant encoding, shredded access), then typed
    try_variant_get extractions. At 100 TB the parse happens once per
    row, not once per extracted field, and malformed payloads yield NULL
    instead of failing the job (ANSI-safe)."""
    e = load_table(spark, sf_dir, "events")
    staged = e.select(
        "event_type", F.try_parse_json("props").alias("v")
    ).select("event_type", F.try_variant_get("v", "$.k", "long").alias("k"))
    return staged.groupBy(
        "event_type", F.pmod("k", F.lit(10)).alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
    )


VARIANT_PROPS_SQL = """
SELECT event_type,
       ((TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10) + 10) % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1, 2
"""


def dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 — rescheduled-game dedup (src/function.py:624-636): keep one row
    per (user_id, event_type), the EARLIEST by event time — first-write-
    wins, the reference's PK-violation semantics (a later duplicate is
    the one discarded). The name reads "dedup the latest-arriving
    duplicates AWAY"; for last-write-wins see merge_upsert /
    cdc_apply_changelog, whose WHEN MATCHED takes the newer row. Batch
    dual of dropDuplicates within a streaming micro-batch."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


DEDUP_EVENT_SQL = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


def late_outcome_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T3 — two-phase state: first event per user 'prepares' the row,
    a later 'purchase' event completes the outcome; never-completing users
    keep NULL (ties/postponed analog, src/function.py:485-494)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    first = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_event"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("value").alias("outcome_value"))
    )
    return first.join(purchases, "user_id", "left").select(
        "user_id", "first_event", "outcome_value"
    )


LATE_OUTCOME_SQL = """
WITH first AS (
  SELECT user_id, event_type AS first_event FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
    FROM events) WHERE rn = 1
), purchases AS (
  SELECT user_id, value AS outcome_value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
    FROM events WHERE event_type = 'purchase') WHERE rn = 1
)
SELECT f.user_id, f.first_event, p.outcome_value
FROM first f LEFT JOIN purchases p ON f.user_id = p.user_id
"""




def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema (the structured dual of
    get_json_object): parse props into a typed struct, filter on a field."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.filter(F.col("p.k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high_k"),
            F.sum(F.col("p.k").cast("long")).alias("sum_high_k"),
        )
    )


FROM_JSON_SQL = """
SELECT event_type, COUNT(*) AS n_high_k,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_high_k
FROM events
WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) > 50
GROUP BY event_type
"""




def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window in BATCH mode (same operator the streaming
    job uses) — oracle is the lag-cumsum construction, proving the two
    sessionization formulations agree."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "sess_start"
            ),
            "n_events",
        )
    )


SESSION_NATIVE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_no
"""


FUNNEL_PATTERN = "signup.*view.*purchase"


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per-user event-type path (time-ordered,
    event_id tie-break) + regex funnel match — the ordered-sequence
    pattern behind conversion metrics. One shuffle (groupBy user);
    ordering is done by sorting (ts, event_id, type) structs inside the
    aggregated array, so no window sort or secondary shuffle."""
    e = load_table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
            ),
            lambda s: s["event_type"],
        ),
        ",",
    )
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), path.alias("path")
    )
    return per_user.select(
        "user_id",
        "n_events",
        F.col("path").rlike(FUNNEL_PATTERN).cast("int").alias("converted"),
    )


FUNNEL_SQL = f"""
SELECT user_id, COUNT(*) AS n_events,
       CASE WHEN regexp_matches(string_agg(event_type, ',' ORDER BY ts ASC, event_id ASC),
                                '{FUNNEL_PATTERN}')
            THEN 1 ELSE 0 END AS converted
FROM events GROUP BY user_id
"""


def event_pair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase pairs within 1 hour per user — the batch dual of
    the watermarked stream-stream join in streaming.jobs
    (click_purchase_stream_join); identical join condition, minus the
    watermark. Equi-join on user_id carries the shuffle; the time bound
    is a residual range predicate evaluated join-side."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    delay = F.col("purchase_ts").cast("double") - F.col("click_ts").cast("double")
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user")) & (delay >= 0) & (delay < 3600),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            S.stable_round(delay, 3).alias("delay_sec"),
        )
    )


EVENT_PAIR_SQL = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       (ROUND((epoch(p.ts) - epoch(c.ts)) * 1e3) / 1e3) AS delay_sec
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch(p.ts) - epoch(c.ts) >= 0
 AND epoch(p.ts) - epoch(c.ts) < 3600
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (the classic product-analytics query):
    users grouped by first-seen week; distinct active users per
    (cohort_week, weeks_since). Two shuffles on user_id (first-seen agg +
    join back) — at scale both sides hash-partition on the same key so
    the join reuses the agg's partitioning; the weekly rollup then
    combines map-side. Week arithmetic in epoch seconds (both engines
    truncate weeks to Monday in UTC)."""
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    j = e.select("user_id", wk.alias("wk")).join(firsts, "user_id")
    week_n = (
        (F.unix_timestamp("wk") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("long")
    return j.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        week_n.alias("week_n"),
    ).agg(F.count_distinct("user_id").alias("n_users"))


COHORT_RETENTION_SQL = """
WITH f AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), j AS (
  SELECT e.user_id, date_trunc('week', e.ts) AS wk, f.cohort_week
  FROM events e JOIN f USING (user_id)
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(FLOOR((epoch(wk) - epoch(cohort_week)) / 604800) AS BIGINT) AS week_n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM j GROUP BY 1, 2
"""


def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog APPLY (the "materialize a Debezium/upsert feed"
    engine op; batch dual of ``streaming.jobs.upsert_outcomes_foreach_batch``):
    events are an ordered changelog per ``user_id`` — ``error`` is a
    delete tombstone, every other event an upsert carrying ``value``.
    Final state = the last change per key under the (ts, event_id) total
    order, minus keys whose last change is a tombstone; ``n_changes`` is
    the audit trail length. ONE shuffle: the row_number and the count
    windows share the user_id exchange."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_changes", F.count(F.lit(1)).over(W.partitionBy("user_id"))
        )
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.col("value").alias("last_value"),
            F.col("n_changes").cast("long").alias("n_changes"),
        )
    )


CDC_APPLY_SQL = """
SELECT user_id, event_type AS last_op, value AS last_value, n_changes FROM (
  SELECT user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def scd2_history_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history REBUILD from a raw event stream — the batch
    backfill dual of ``operators.scd.scd2_apply`` (which applies one CDC
    batch to existing state): per user, every change of ``event_type``
    opens a version row; ``valid_from_us``/``valid_to_us`` are exact
    BIGINT microseconds (lead-window close; NULL = current/open row).
    One user_id exchange feeds the change-detect lag, the version
    filter, and the closing lead."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
    ).withColumn("prev", F.lag("event_type").over(w))
    vers = seq.filter(
        F.col("prev").isNull() | (F.col("event_type") != F.col("prev"))
    )
    return vers.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
    )


SCD2_REBUILD_SQL = """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), vers AS (
  SELECT user_id, event_type, ts_us, event_id FROM seq
  WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type, ts_us AS valid_from_us,
       LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us
FROM vers
"""


# AS OF instant for the snapshot entry: the testdata corpus spans a fixed
# 30-day window (2024-01-01 .. 2024-01-30) at EVERY SF, so the mid-corpus
# constant is deterministic, never vacuous, and — unlike a computed
# min/max midpoint — needs no epoch arithmetic, keeping one SQL text
# verbatim-portable across Spark SQL and DuckDB (r4 verdict item #8; the
# computed midpoint also carried a truncate-vs-round 1µs parity flake).
SCD2_ASOF_T = "2024-01-16 00:00:00"


def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) query over the SCD2 history — the read side
    that justifies keeping versioned rows at all: reconstruct every
    user's state at time T (= ``SCD2_ASOF_T``, the corpus midpoint) and
    roll it up per state. Selection is the interval predicate
    ``valid_from <= T < coalesce(valid_to, +inf)`` — exactly one row per
    user with history at T, no window re-sort: the rebuild's exchanges
    are reused and the as-of filter is map-side. Timestamp-native (the
    testdata timestamps are microsecond-exact on both engines), so the
    oracle SQL runs verbatim on Spark SQL too (tri-modal, pinned in
    tests/test_sql_surface.py). At 100 TB the production trim is
    partition-pruning the history on valid_from date ranges; the
    predicate shape is unchanged.

    NOTE: the lag-change-detect + lead-close pipeline below is a
    DELIBERATE twin of ``scd2_history_rebuild`` in a different time
    representation (timestamps here so the SQL is verbatim-portable;
    epoch microseconds there so the rebuild's arithmetic is exact
    integers). A fix to the versioning logic — e.g. the tie-break
    ordering — must be applied to BOTH; parameterizing one on the time
    type was judged worse than the duplication (it would thread the
    representation through every window expression and both SQL
    texts)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    vers = seq.filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
    wv = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    hist = vers.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
    )
    t = F.lit(SCD2_ASOF_T).cast("timestamp")
    asof = hist.filter(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    )
    return asof.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users_in_state"),
        F.min("valid_from").alias("oldest_entry"),
        F.max("valid_from").alias("newest_entry"),
    )


SCD2_ASOF_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), vers AS (
  SELECT user_id, event_type, ts, event_id FROM seq
  WHERE prev IS NULL OR event_type <> prev
), hist AS (
  SELECT user_id, event_type, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM vers
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users_in_state,
       MIN(valid_from) AS oldest_entry,
       MAX(valid_from) AS newest_entry
FROM hist
WHERE valid_from <= TIMESTAMP '{SCD2_ASOF_T}'
  AND (valid_to IS NULL OR TIMESTAMP '{SCD2_ASOF_T}' < valid_to)
GROUP BY event_type
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral TRANSITION matrix (the Markov-chain view
    of a clickstream: P(next state | state), the input to funnel design,
    churn prediction features, and next-action models): per ordered
    (prev → next) event-type pair, the transition count and the
    row-normalized probability over each prev state's outgoing edges.

    One user_id exchange feeds the ordering lag; the pair counts are a
    states²-bounded aggregate (tiny at any corpus size), and the row
    normalization is a window over that tiny table — the corpus is
    touched exactly once. Exact integer counts; probability rounded 6dp."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("prev_type"),
            F.col("next_type").alias("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wout = W.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        S.stable_round(
            F.col("n").cast("double") / F.sum("n").over(wout).cast("double"), 6
        ).alias("p"),
    )


def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily GROWTH ACCOUNTING (the new/retained/resurrected/churned
    decomposition every growth team runs — DAU is vanity until split
    this way): per calendar day, users seen for the first time (new),
    also active the previous day (retained), returning after a gap
    (resurrected), and users whose previous-day activity did NOT carry
    over (churned, attributed to the first inactive day).

    Identity (pinned by the oracle): for consecutive days,
    ``DAU(d) = new + retained + resurrected`` and
    ``churned(d) = DAU(d-1) − retained(d)``. Churn rows are CLIPPED to
    days <= the last observed corpus day: users active on the final day
    are right-censored (their next state is unknowable), not churned —
    without the clip the report grows a phantom day beyond the corpus
    span where every final-day user appears churned. Plan: one distinct
    (user, day) agg, ONE user-partitioned window producing both lag and
    lead, then two tiny branches (state rows + churn rows shifted one
    day, bounded by a broadcast 1-row max-day agg) unioned into a
    per-day conditional agg — the fact table is scanned once, every
    later stage is user-day-bounded."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    max_day = ud.agg(F.max("day").alias("max_day"))
    w = W.partitionBy("user_id").orderBy("day")
    marked = ud.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    state = marked.select(
        "day",
        F.when(F.col("prev_day").isNull(), "new")
        .when(F.col("prev_day") == F.date_sub("day", 1), "retained")
        .otherwise("resurrected")
        .alias("kind"),
    )
    churn = (
        marked.filter(
            F.col("next_day").isNull() | (F.col("next_day") > F.date_add("day", 1))
        )
        .select(F.date_add("day", 1).alias("day"), F.lit("churned").alias("kind"))
        .crossJoin(F.broadcast(max_day))
        .filter(F.col("day") <= F.col("max_day"))
        .select("day", "kind")
    )
    return (
        state.unionByName(churn)
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("kind") == "new", 1)).cast("long").alias("n_new"),
            F.count(F.when(F.col("kind") == "retained", 1))
            .cast("long")
            .alias("n_retained"),
            F.count(F.when(F.col("kind") == "resurrected", 1))
            .cast("long")
            .alias("n_resurrected"),
            F.count(F.when(F.col("kind") == "churned", 1))
            .cast("long")
            .alias("n_churned"),
        )
    )


GROWTH_ACCOUNTING_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), marked AS (
  SELECT user_id, day,
         LAG(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
         LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
  FROM ud
), labeled AS (
  SELECT day,
         CASE WHEN prev_day IS NULL THEN 'new'
              WHEN prev_day = day - INTERVAL 1 DAY THEN 'retained'
              ELSE 'resurrected' END AS kind
  FROM marked
  UNION ALL
  SELECT CAST(day + INTERVAL 1 DAY AS DATE) AS day, 'churned' AS kind
  FROM marked
  WHERE (next_day IS NULL OR next_day > day + INTERVAL 1 DAY)
    AND CAST(day + INTERVAL 1 DAY AS DATE) <= (SELECT MAX(day) FROM ud)
)
SELECT day,
       CAST(COUNT(*) FILTER (WHERE kind = 'new') AS BIGINT) AS n_new,
       CAST(COUNT(*) FILTER (WHERE kind = 'retained') AS BIGINT) AS n_retained,
       CAST(COUNT(*) FILTER (WHERE kind = 'resurrected') AS BIGINT) AS n_resurrected,
       CAST(COUNT(*) FILTER (WHERE kind = 'churned') AS BIGINT) AS n_churned
FROM labeled GROUP BY day
"""


EVENT_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS prev_type, next_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) * 1e6) / 1e6 AS p
FROM pairs
"""


QUERIES: dict[str, QueryDef] = {
    "event_transition_matrix": QueryDef(
        event_transition_matrix,
        EVENT_TRANSITION_SQL,
        "behavioral Markov transition matrix (counts + row-normalized P)",
    ),
    "growth_accounting": QueryDef(
        growth_accounting,
        GROWTH_ACCOUNTING_SQL,
        "daily new/retained/resurrected/churned user decomposition",
    ),
    "cdc_apply_changelog": QueryDef(
        cdc_apply_changelog, CDC_APPLY_SQL, "CDC feed materialization with tombstones"
    ),
    "scd2_history_rebuild": QueryDef(
        scd2_history_rebuild, SCD2_REBUILD_SQL, "SCD2 version history from raw events"
    ),
    "scd2_asof_snapshot": QueryDef(
        scd2_asof_snapshot, SCD2_ASOF_SQL, "AS OF point-in-time state over SCD2 history"
    ),
    "variant_props_extract": QueryDef(
        variant_props_extract, VARIANT_PROPS_SQL, "VariantType semi-structured extract"
    ),
    "cohort_retention": QueryDef(
        cohort_retention, COHORT_RETENTION_SQL, "cohort retention matrix"
    ),
    "funnel_conversion": QueryDef(funnel_conversion, FUNNEL_SQL, "funnel path analysis"),
    "event_pair_join": QueryDef(event_pair_join, EVENT_PAIR_SQL, "click→purchase range join"),
    "tumbling_window_agg": QueryDef(tumbling_window_agg, TUMBLING_SQL, "T5 tumbling window"),
    "sliding_window_agg": QueryDef(sliding_window_agg, SLIDING_SQL, "T5 sliding window"),
    "session_windows": QueryDef(session_windows, SESSION_SQL, "sessionization"),
    "session_window_native": QueryDef(
        session_window_native, SESSION_NATIVE_SQL, "native session_window (batch)"
    ),
    "json_props_extract": QueryDef(json_props_extract, JSON_PROPS_SQL, "JSON scalar fns"),
    "from_json_struct": QueryDef(from_json_struct, FROM_JSON_SQL, "from_json typed parse"),
    "dedup_latest_event": QueryDef(dedup_latest_event, DEDUP_EVENT_SQL, "T4 dedup"),
    "late_outcome_upsert": QueryDef(late_outcome_upsert, LATE_OUTCOME_SQL, "T2/T3 late data"),
}
