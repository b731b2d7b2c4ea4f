"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check.
``queries()`` / ``oracle_sql()`` expose the registered query surface
(one entry per implemented operator from SURVEY.md §2, plus the
training-data-pipeline extensions); the driver compares each Spark
result against the DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (  # noqa: E402
    oracle_sql_map,
    queries_map,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries import (
        REGISTRY,
    )

    return REGISTRY["tpch_q1_pricing_summary"].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; callables take (spark, sf_dir)."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return oracle_sql_map()
