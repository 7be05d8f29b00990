"""Flagship query + games-pipeline-shaped queries over testdata.

The flagship (SURVEY.md §7 M0) transplants the reference's signature
pattern — as-of "stats going into the game" (README.md:26-28), guarded
ratio (modeling/eda.ipynb:451), dropna funnel (cells 15/24), then summary
aggregation — onto the ``orders`` table in one SQL-expressible query:
scan → window(as-of) → conditional → filter → aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import scalars as S
from ..session import load_table
from .base import QueryDef

D2 = "decimal(18,2)"


def flagship_asof_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: avg of the customer's *prior* order totals (as-of frame
    excluding the current row), guarded ratio current/prior, drop rows with
    no history (the dropna funnel), then per-priority digest.

    One shuffle for the window (hash by o_custkey) feeding directly into a
    partial+final aggregation — at 100 TB the window exchange is the only
    wide dependency and AQE coalesces its output.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior_avg = F.sum(F.col("o_totalprice").cast(D2)).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    enriched = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        prior_avg.alias("prior_avg"),
    ).withColumn(
        "ratio", S.stable_round(S.guarded_div(F.col("o_totalprice"), F.col("prior_avg")), 6)
    )
    kept = enriched.na.drop("any")
    return kept.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(F.col("ratio").cast("decimal(28,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_ratio"
        ),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        F.sum((F.col("ratio") > 1).cast("long")).alias("n_above_prior"),
    )


FLAGSHIP_SQL = """
WITH enriched AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS prior_avg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), ratioed AS (
  SELECT *, (ROUND((CASE WHEN prior_avg IS NULL OR prior_avg = 0 THEN NULL
                       ELSE o_totalprice / prior_avg END) * 1e6) / 1e6) AS ratio
  FROM enriched
), kept AS (
  SELECT * FROM ratioed
  WHERE o_orderkey IS NOT NULL AND o_orderpriority IS NOT NULL
    AND o_totalprice IS NOT NULL AND prior_avg IS NOT NULL AND ratio IS NOT NULL
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ratio AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_ratio,
       MIN(ratio) AS min_ratio,
       MAX(ratio) AS max_ratio,
       CAST(SUM(CASE WHEN ratio > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_prior
FROM kept GROUP BY o_orderpriority
"""


QUERIES: dict[str, QueryDef] = {
    "flagship_asof_funnel": QueryDef(
        flagship_asof_funnel, FLAGSHIP_SQL, "flagship: as-of + guard + funnel + agg"
    ),
}
