"""Central query registry consumed by __spark_entry__.py.

Every operator claimed done in SURVEY.md §2 has an entry here; entries
with ``sql`` get the DuckDB-oracle hash check, entries without get the
rows-only check (non-SQL-expressible ops: MLlib fits, LSH, hash-seeded
sketches).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import QueryDef
from . import core, embeddings, events, extra, ml, mlb, multimodal, ops, text

QUERIES: dict[str, QueryDef] = {}
for _mod in (core, embeddings, events, extra, ml, mlb, multimodal, ops, text):
    for _name, _qd in _mod.QUERIES.items():
        assert _name not in QUERIES, f"duplicate query name: {_name}"
        QUERIES[_name] = _qd


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: qd.sql for name, qd in QUERIES.items() if qd.sql is not None}
