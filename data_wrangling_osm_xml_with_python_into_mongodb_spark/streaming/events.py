"""Structured Streaming ingest of the events table.

The reference has no stream processing (SURVEY.md §2.10) -- its
``ET.iterparse`` is incremental parsing only.  This module is the
scale extension: the same tumbling-window aggregation as the batch
query ``s1_tumbling_window_counts`` (plans/queries_profile.py), run as
an incremental streaming plan with event-time watermarking, so the two
are mutually checking twins (the test asserts stream == batch on a
static input).

Scale notes: windowed agg state is partitioned by (window, event_type)
across executors; the 10-minute watermark bounds state size -- late
rows beyond it are dropped and their window state evicted.  The file
source lists input splits incrementally (maxFilesPerTrigger throttles
ingest at production scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open {sf_dir}/events.parquet as a file-source stream.

    Streaming file sources need an explicit schema; steal it from a
    one-off batch read of the same path (footer-only, cheap).
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source requires a directory: stream the sf dir,
    # glob-filtered to the events file(s).
    reader = (
        spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(sf_dir)
    # Same nanos normalization as sources/tables.py load_table.
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts + value totals per event type.

    Works on both batch and streaming frames (the streaming variant
    adds the watermark; a batch frame ignores it)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_to_memory_sink(
    spark: SparkSession, sf_dir: str, table_name: str = "windowed_events"
) -> DataFrame:
    """Drive the streaming plan to completion on a static directory and
    return the materialized result (complete output mode so every
    window is emitted even though the watermark never advances past a
    static input's max event time)."""
    agg = windowed_event_counts(read_event_stream(spark, sf_dir))
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table_name)
