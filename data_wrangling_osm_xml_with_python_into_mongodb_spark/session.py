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
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    # Direct-memory cap: small by default to force netty buffer reuse
    # (see the heap comment below), but 32 threads x sf1-scale shuffle
    # buffers legitimately need more -- the bench's sf1 block raises it
    # via this env var instead of dropping to 16 threads.
    direct_mem = os.environ.get("SPARK_GRAFT_DIRECT_MEM", "2g")
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
        # zstd over the snappy default: measured ~12% less write CPU on
        # the nested-map document table AND ~30% smaller files (10 vs 14
        # MB at the 77 MB bench scale) -- at 100 TB the I/O saving
        # compounds into every downstream scan.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # The synthetic events table stores TIMESTAMP(NANOS); Spark's
        # reader has no nanos type -- surface as long and convert in
        # the loader (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # No mapKeyDedupPolicy override: every map build dedups its
        # entries explicitly (operators/shape._keep_last_by), so the
        # pipeline carries no session-conf dependency.
        .config("spark.ui.enabled", "false")
        # Local mode runs every executor thread inside the driver JVM.
        # Keep the heap SMALL and PINNED: this environment's first-touch
        # page-fault bandwidth is ~20-100 MB/s (measured; warm pages are
        # ~4 GB/s), so a large growing heap keeps expanding into cold
        # pages and a 10 s job degrades to 200 s.  A small Xms=Xmx heap
        # warms once and is recycled by GC; capped direct memory forces
        # buffer reuse instead of fresh allocateDirect zeroing.
        # UseAVX=2: this sandbox (Ice Lake under a hypervisor, microcode
        # 0x1) reproducibly SIGSEGVs in HotSpot's AVX-512 arraycopy stub
        # (~StubRoutines::jlong_disjoint_arraycopy_avx3, two hs_err
        # captures during sf1-scale sorts).  Pinning the JIT to AVX2
        # sidesteps the buggy stubs; throughput impact is noise here
        # (memory-bound workload + Ice Lake AVX-512 downclocking).
        .config("spark.driver.memory", driver_mem)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:MaxDirectMemorySize={direct_mem} -XX:UseAVX=2",
        )
        # Split generated code into smaller methods: keeps wide
        # projections/aggregations under HotSpot's JIT size limits
        # (measured 7x on the OSM shaping stage vs the 1024 default).
        .config("spark.sql.codegen.methodSplitThreshold", "128")
        # ObjectHashAggregate (collect_list/map_from_entries aggs) falls
        # back to sort-based aggregation after 128 distinct keys per
        # partition -- i.e. always, for any real group-by.  Raising the
        # threshold keeps the hash path (measured ~1.7x on the OSM
        # shaping agg); partition sizing caps per-partition key counts,
        # so memory stays bounded at scale.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "5000000",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
