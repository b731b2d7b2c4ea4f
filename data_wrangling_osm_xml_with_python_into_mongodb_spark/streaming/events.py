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
    # Same ts normalization as sources/tables.py load_table: nanos-longs
    # and TIMESTAMP_NTZ both become session-zoned TIMESTAMP, which
    # withWatermark requires (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ).
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
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


def sliding_window_rates(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event rates (each event lands in window/slide
    overlapping windows).  Batch/stream dual like
    :func:`windowed_event_counts`."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def dedup_event_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact deduplication on the natural event key -- the
    stream twin of the batch dd1 exact-dedup stage (a training-data
    ingest pipeline dedups at the stream edge before anything lands).

    Batch/stream dual: on a stream this is
    ``withWatermark + dropDuplicatesWithinWatermark`` (state holds only
    keys younger than the watermark -- bounded, evicted as event time
    advances, the only way stream dedup state survives at 100 TB/day);
    on a batch frame plain ``dropDuplicates`` gives identical rows,
    which is what the equivalence test asserts.
    """
    keys = ["user_id", "ts", "event_type"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def run_dedup_to_memory_sink(
    spark: SparkSession, sf_dir: str, table_name: str = "deduped_events"
) -> DataFrame:
    """Drive the streaming dedup over a static directory and return the
    materialized surviving rows."""
    deduped = dedup_event_stream(read_event_stream(spark, sf_dir))
    q = (
        deduped.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table_name)


def stateful_user_sessions(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (the reference has no streaming; this is
    the SURVEY §2.10 extension's stateful half, semantics identical to
    the batch ``w3_user_sessions`` query -- a >30 min gap starts a new
    session).

    State per user: (n_sessions, n_events, last_ts_epoch_s).  Each
    micro-batch folds its (sorted) events into the carried state and
    emits the updated totals, so the operator is incremental: state is
    O(users), not O(events).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id bigint, n_sessions bigint, n_events bigint"
    state_schema = "n_sessions bigint, n_events bigint, last_ts bigint"

    def fold(key, pdfs, state):
        import pandas as pd

        n_sessions, n_events, last_ts = (
            state.get if state.exists else (0, 0, None)
        )
        chunks = [pdf[["ts", "event_id"]] for pdf in pdfs]
        ev = pd.concat(chunks).sort_values(["ts", "event_id"])
        if len(ev):
            # Vectorized session fold: a session starts where the gap
            # from the previous event exceeds 30 min.  The first
            # event's "previous" is the carried last_ts (NaN -> new
            # session when no state yet).
            ts_s = ev["ts"].astype("int64") // 1_000_000_000
            prev = ts_s.shift(1)
            if last_ts is not None:
                prev.iloc[0] = last_ts
            n_sessions += int((prev.isna() | (ts_s - prev > 1800)).sum())
            n_events += len(ev)
            last_ts = int(ts_s.iloc[-1])
        state.update((n_sessions, n_events, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessions_to_memory_sink(
    spark: SparkSession, sf_dir: str, table_name: str = "streamed_sessions"
) -> DataFrame:
    """Drive the stateful sessionization over a static directory (single
    micro-batch) and return the materialized per-user totals."""
    sessions = stateful_user_sessions(read_event_stream(spark, sf_dir))
    q = (
        sessions.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table_name)


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions via the NATIVE session_window operator --
    batch/stream dual (the batch form is oracle-gated as
    w4_session_window_native; under streaming the watermark bounds
    session state, and closed sessions emit in append mode)."""
    from pyspark.sql import functions as F

    if events.isStreaming:
        events = events.withWatermark("ts", gap)
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def run_session_windows_to_memory_sink(
    spark: SparkSession, sf_dir: str, table_name: str = "session_windows"
) -> DataFrame:
    """Drive the native-session-window streaming plan to completion on
    a static directory (complete mode, as run_to_memory_sink)."""
    agg = session_window_counts(read_event_stream(spark, sf_dir))
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


def minute_partial_counts(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Level-0 continuous aggregate: 1-minute (count, sum) partials per
    event type -- the mergeable state every coarser rollup reads
    (hr1_hypertable_rollup's cascade base).  Batch/stream dual: the
    streaming form is the incrementally-maintained materialization."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        # decimal(18,2) partials: event values carry two decimals, so the
        # partial sums are EXACT and re-aggregation order cannot move the
        # final total by an ulp (double partials re-added in a different
        # order than a single-pass sum can -- 0.01 is not representable
        # in binary floating point).
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("psum"),
        )
        .select(F.col("w.start").alias("mstart"), "event_type", "pn", "psum")
    )


def rollup_hourly_from_partials(partials: DataFrame) -> DataFrame:
    """Level 1 of the cascade: hourly totals re-aggregated from the
    minute partials (never from raw events).  Associativity of
    count/sum makes this exact; ratio metrics belong to consumers."""
    return (
        partials.groupBy(F.window("mstart", "1 hour").alias("w"), "event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("psum").alias("vsum"),
            F.count(F.lit(1)).alias("n_minutes"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            # Exact decimal -> double: both engines round the same exact
            # 2-decimal quantity to the same nearest double.
            F.col("vsum").cast("double").alias("total_value"),
            "n_minutes",
        )
    )


def run_rollup_cascade_to_memory_sink(
    spark: SparkSession, sf_dir: str, table_name: str = "minute_partials"
) -> DataFrame:
    """Maintain the minute-partial level under Structured Streaming
    (complete mode on a static dir), then batch-roll the hourly level
    off the streamed partials -- the full continuous-aggregate shape:
    stream keeps level 0 fresh, cheap periodic batch derives level 1."""
    partials = minute_partial_counts(read_event_stream(spark, sf_dir))
    q = (
        partials.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return rollup_hourly_from_partials(spark.table(table_name))


def interval_join_pairs_stream(
    purchases: DataFrame, clicks: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream event-time range join: purchases x clicks of the
    same user with the click in [purchase - 1h, purchase].  Both sides
    are watermarked and the range condition is BOUNDED, so Spark can
    expire each side's join state as the watermark advances -- the
    canonical pattern where stream-stream joins stay O(rate x window)
    instead of O(history).  Batch twin (same pair set, DuckDB-gated):
    aj2_interval_join_pairs."""
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id", "user_id")


def run_interval_join_to_memory_sink(
    spark: SparkSession, sf_dir: str, table_name: str = "interval_join_pairs"
) -> DataFrame:
    stream = read_event_stream(spark, sf_dir)
    out = interval_join_pairs_stream(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "click"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table_name)


def cdc_snapshot_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the m8 CDC apply
    (plans/queries_updates.py:q_cdc_snapshot): maintain the
    last-writer-wins state per user as the changelog streams in.

    The replay order is the same (epoch-micros, event_id) arithmetic
    key the batch window sorts by, so max_by picks the identical
    winner; the aggregate carries ONE (key, change) struct per user --
    per-key state is O(1), total state is O(|users|), which is the
    floor for a CDC snapshot (every live key must be representable).
    No watermark: a snapshot can never expire keys, only tombstone
    them -- the downstream filter drops users whose final change is a
    delete.  Works identically on a batch frame, which is what the
    stream==batch pytest asserts."""
    # Batch frames may arrive straight off the raw parquet (NTZ ts);
    # the stream reader already normalized.  unix_micros needs TIMESTAMP.
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    # Deterministic total order as ARITHMETIC, not string formatting:
    # epoch_micros * 10^12 + event_id in decimal(38,0)/HUGEINT.  The
    # old zero-padded %020d%012d key silently broke lexicographic
    # ordering for negative epochs or event_id >= 10^12 (%d just widens
    # the field); the arithmetic key stays numerically ordered for any
    # long inputs and equals (ts, event_id) lex order whenever
    # 0 <= event_id < 10^12 (the generator domain; asserted in
    # tests/test_streaming.py).
    key = (
        F.unix_micros("ts").cast("decimal(38,0)") * F.lit(10**12)
        + F.col("event_id")
    )
    last = events.groupBy("user_id").agg(
        F.max_by(
            F.struct(
                F.col("event_type"),
                F.col("value").cast("decimal(18,2)").alias("value"),
            ),
            key,
        ).alias("final")
    )
    return last.select(
        "user_id",
        F.col("final.event_type").alias("final_type"),
        F.col("final.value").alias("value"),
    ).filter(F.col("final_type") != "error")


def run_cdc_snapshot_to_memory_sink(
    spark: SparkSession, sf_dir: str, table_name: str = "cdc_snapshot"
) -> DataFrame:
    """Drive the streaming CDC snapshot over a static directory
    (complete mode: the sink holds the full current snapshot, exactly
    how a serving layer would consume it) and return the materialized
    state."""
    snap = cdc_snapshot_stream(read_event_stream(spark, sf_dir))
    q = (
        snap.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table_name)


def countmin_grid_stream(events: DataFrame, depth: int, width_hex_chars: int = 2) -> DataFrame:
    """Streaming maintenance of the sk3 Count-Min counter grid
    (plans/queries_profile.py:q_countmin_heavy_hitters): the same
    md5-derived (row, bucket) cells, kept incrementally as a streaming
    aggregation.

    This is the payoff of mergeable-sketch discipline: the streaming
    state is the SKETCH ITSELF (depth x 256 counters, constant in
    stream length), so a 100 TB/day stream maintains frequency
    estimates with bounded memory while the exact per-key counts it
    approximates would need O(|keys|) state.  Batch/stream dual; the
    pytest asserts cell-for-cell equality against the batch grid."""
    hashed = events.selectExpr(
        "user_id", f"explode(sequence(0, {depth - 1})) AS j"
    ).selectExpr(
        "j",
        f"CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', "
        f"CAST(user_id AS STRING))), 1, {width_hex_chars}), 16, 10) AS INT)"
        " AS bucket",
    )
    return hashed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))


def run_countmin_grid_to_memory_sink(
    spark: SparkSession, sf_dir: str, depth: int, table_name: str = "cm_grid"
) -> DataFrame:
    grid = countmin_grid_stream(read_event_stream(spark, sf_dir), depth)
    q = (
        grid.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table_name)


def ohlc_bars_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of hr2 (plans/queries_profile.py:q_ohlc_bars):
    per-(event_type, hour) OHLC bars maintained incrementally.

    min_by/max_by/min/max/count are all mergeable one-pair-or-scalar
    aggregates, so per-bar state is constant-size no matter how many
    ticks land in the hour -- the same discipline that lets the batch
    partial+final agg ship bar-sized shuffles.  The (epoch-micros,
    event_id) arithmetic key makes open/close deterministic under any
    arrival order, which is exactly what a stream needs (events arrive
    out of order by construction)."""
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    v = F.col("value").cast("decimal(18,2)")
    # Deterministic total order as ARITHMETIC, not string formatting:
    # epoch_micros * 10^12 + event_id in decimal(38,0)/HUGEINT.  The
    # old zero-padded %020d%012d key silently broke lexicographic
    # ordering for negative epochs or event_id >= 10^12 (%d just widens
    # the field); the arithmetic key stays numerically ordered for any
    # long inputs and equals (ts, event_id) lex order whenever
    # 0 <= event_id < 10^12 (the generator domain; asserted in
    # tests/test_streaming.py).
    key = (
        F.unix_micros("ts").cast("decimal(38,0)") * F.lit(10**12)
        + F.col("event_id")
    )
    return (
        events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bar_ts")
        )
        .agg(
            F.min_by(v, key).cast("double").alias("open"),
            F.max(v).cast("double").alias("high"),
            F.min(v).cast("double").alias("low"),
            F.max_by(v, key).cast("double").alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def run_ohlc_bars_to_memory_sink(
    spark: SparkSession, sf_dir: str, table_name: str = "ohlc_bars"
) -> DataFrame:
    bars = ohlc_bars_stream(read_event_stream(spark, sf_dir))
    q = (
        bars.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table_name)
