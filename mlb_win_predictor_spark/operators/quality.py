"""Data-quality constraint checking (training-data pipeline hygiene).

Declarative rules evaluated in ONE pass (a single aggregation computes
every violation count — no per-rule scans) plus a row-level violations
extractor for debugging. The data-quality gate an LLM-data pipeline runs
before a corpus enters training.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """name + a Column predicate that is True when the row VIOLATES."""

    name: str
    violated: Column


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Rule:
    c = F.col(col)
    return Rule(f"{col}_in_range", c.isNotNull() & ((c < lo) | (c > hi)))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"{col}_matches", c.isNotNull() & ~c.rlike(pattern))


def one_of(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(f"{col}_one_of", c.isNotNull() & ~c.isin(values))


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule: violation count + rate — single-pass aggregation."""
    total = F.count(F.lit(1))
    agg = df.agg(
        total.alias("_total"),
        *[F.sum(r.violated.cast("long")).alias(r.name) for r in rules],
    )
    pairs = F.array(
        *[
            F.struct(F.lit(r.name).alias("rule"), F.col(r.name).alias("violations"))
            for r in rules
        ]
    )
    return (
        agg.select("_total", F.explode(pairs).alias("p"))
        .select(
            F.col("p.rule").alias("rule"),
            F.col("p.violations").alias("violations"),
            (F.col("p.violations") / F.col("_total")).alias("violation_rate"),
        )
    )


def observe_constraints(df: DataFrame, rules: list[Rule], name: str = "dq"):
    """Zero-extra-pass quality metrics via ``df.observe``: violation
    counters piggyback on whatever action the pipeline runs anyway
    (write, count, stream batch) — at 100 TB the quality gate costs no
    second scan at all. Returns ``(df_with_observation, observation)``;
    read ``observation.get`` AFTER an action has run.

    The metric set mirrors check_constraints (total + one violation
    count per rule)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("_total"),
        *[F.sum(r.violated.cast("long")).alias(r.name) for r in rules],
    )
    return observed, obs


def violating_rows(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Rows breaking any rule, tagged with the list of broken rule names."""
    broken = F.filter(
        F.array(
            *[
                F.when(r.violated, F.lit(r.name)).otherwise(F.lit(None))
                for r in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("broken_rules", broken).filter(F.size("broken_rules") > 0)


def unique_key_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Duplicate-key groups (uniqueness needs its own aggregation — it is
    not a row-local predicate)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
