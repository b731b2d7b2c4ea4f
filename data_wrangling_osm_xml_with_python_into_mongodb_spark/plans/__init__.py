from .queries import REGISTRY, QueryDef, oracle_sql_map, queries_map

__all__ = ["REGISTRY", "QueryDef", "queries_map", "oracle_sql_map"]
