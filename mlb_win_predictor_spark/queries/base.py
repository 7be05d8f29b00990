"""Query-catalog plumbing.

Each catalog entry is a ``QueryDef``: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) the equivalent ANSI SQL string a
DuckDB oracle runs over the same parquet. The driver hash-compares the two
(order-insensitive), so every query here must be *value-deterministic*:

- no bare ``limit`` without a total order;
- no double-precision SUM/AVG whose result depends on partition order —
  money columns are aggregated as DECIMAL (exact, associative) and cast
  to double at the end, so Spark's partial aggregation tree and DuckDB's
  single-threaded fold produce bit-identical values;
- variance-family outputs rounded (floating merge order contributes
  ~1e-12 relative fuzz);
- timestamps bucketed via string formatting to sidestep µs/ns and
  timezone representation differences.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    """One catalog entry. ``sql=None`` => rows-only check (non-SQL op)."""

    fn: SparkQuery
    sql: str | None
    doc: str = ""


def dec(col: str, prec: int = 18, scale: int = 2) -> str:
    """SQL fragment: exact decimal view of a money/quantity double."""
    return f"CAST({col} AS DECIMAL({prec},{scale}))"


def sround(expr: str, k: int) -> str:
    """SQL dual of ``functions.scalars.stable_round`` — identical IEEE op
    sequence on both engines (see that docstring for why plain ROUND(x,k)
    is not cross-engine stable).

    The scale MUST be written in scientific notation: DuckDB types a
    ``100.0`` literal as DECIMAL(4,1), making ``x * 100.0`` a
    decimal-path multiply that differs from Spark's IEEE product by an
    ulp on tie-adjacent values; ``1e2`` is typed DOUBLE.
    """
    return f"(ROUND(({expr}) * 1e{k}) / 1e{k})"
