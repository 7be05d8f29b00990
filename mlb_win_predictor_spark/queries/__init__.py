from .registry import QUERIES, QueryDef, oracle_sql_map, queries_map

__all__ = ["QUERIES", "QueryDef", "oracle_sql_map", "queries_map"]
