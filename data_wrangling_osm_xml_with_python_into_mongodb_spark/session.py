"""SparkSession factory tuned for both local testing and cluster scale.

Local mode (the test harness) runs one JVM with N threads; the configs
below are chosen so the *same plans* scale to a 1000-executor cluster:
AQE handles runtime partition coalescing and skew joins, shuffle
partitions default to the core count locally (on a cluster you'd set
this to 2-3x total cores or rely on AQE), and Arrow is enabled for the
few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_wrangling_osm_xml_with_python_into_mongodb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-ready defaults.

    Honors ``SPARK_GRAFT_CPUS`` for the local master thread count so the
    bench driver controls parallelism.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 4)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching -- the knobs that make the same
        # plan survive a 100x scale-up without hand-tuning.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / toPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Scans: pushdown + pruning are on by default; keep split sizes
        # explicit so partition counts stay sane at any SF.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The synthetic events table stores TIMESTAMP(NANOS); Spark's
        # reader has no nanos type -- surface as long and convert in
        # the loader (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Key rewrites (name_1 -> name) can collide in the tags map;
        # keep the later entry like a dict update would.
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.ui.enabled", "false")
        # Local mode runs every executor thread inside the driver JVM;
        # size the heap for 32 concurrent tasks with agg/join buffers
        # (the box has 128 GiB -- an 8g heap GC-thrashes under load).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Split generated code into smaller methods: keeps wide
        # projections/aggregations under HotSpot's JIT size limits
        # (measured 7x on the OSM shaping stage vs the 1024 default).
        .config("spark.sql.codegen.methodSplitThreshold", "128")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
