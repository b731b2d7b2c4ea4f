from .queries import REGISTRY, QueryDef, oracle_sql_map, queries_map

# Importing these modules populates REGISTRY via @register.
from . import (  # noqa: E402,F401
    queries_dedup,
    queries_etl,
    queries_geo,
    queries_ops,
    queries_profile,
    queries_text,
    queries_updates,
    queries_vectors,
)

__all__ = ["REGISTRY", "QueryDef", "queries_map", "oracle_sql_map"]
