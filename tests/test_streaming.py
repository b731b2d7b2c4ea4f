"""Structured Streaming twin-check: the streaming tumbling-window plan
must produce exactly the batch result on a static input (the streaming
extension has no DuckDB oracle -- the batch query s1_tumbling_window_counts
is oracle-gated, and this test ties the stream to it)."""

from __future__ import annotations

from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.tables import load_table
from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
    run_to_memory_sink,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(load_table(spark, SF_DIR, "events")).collect()
    }
    stream = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in run_to_memory_sink(spark, SF_DIR).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_stateful_sessions_equal_batch(spark):
    """The applyInPandasWithState sessionizer must reproduce the
    oracle-gated batch w3_user_sessions result on a static input."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_profile import (
        q_user_sessions,
    )
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        run_sessions_to_memory_sink,
    )

    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_user_sessions(spark, SF_DIR).collect()
    }
    stream = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in run_sessions_to_memory_sink(spark, SF_DIR).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_sliding_window_overlap(spark):
    """Each event must appear in exactly window/slide sliding windows."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        sliding_window_rates,
    )

    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    total = sum(
        r["n"] for r in sliding_window_rates(ev).collect()
    )
    assert total == 2 * n_events  # 10 min window / 5 min slide


def test_streaming_bronze_equals_batch(spark, tmp_path):
    """The AvailableNow streaming bronze backfill must produce exactly
    the rows the batch XML reader produces on the same files, and a
    re-run after a new shard arrives must parse ONLY the new shard
    (checkpointed parse-once contract)."""
    import os
    import shutil

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.osm_xml import (
        read_osm_elements,
    )
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.bronze import (
        run_bronze_backfill,
    )

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "sample.osm")
    xml_dir = tmp_path / "xml_in"
    xml_dir.mkdir()
    shutil.copy(fixture, xml_dir / "shard0.osm")

    out = str(tmp_path / "bronze_stream")
    ckpt = str(tmp_path / "ckpt")
    run_bronze_backfill(spark, str(xml_dir), out, ckpt)

    key = lambda r: (r["doc_type"], r["_id"])  # noqa: E731
    batch = sorted(
        (r.asDict(recursive=True) for r in read_osm_elements(spark, fixture).collect()),
        key=key,
    )
    streamed = sorted(
        (r.asDict(recursive=True) for r in spark.read.schema(
            read_osm_elements(spark, fixture).schema
        ).parquet(out).collect()),
        key=key,
    )
    assert streamed == batch

    # Second shard arrives; incremental drain appends only its rows.
    shutil.copy(fixture, xml_dir / "shard1.osm")
    run_bronze_backfill(spark, str(xml_dir), out, ckpt)
    assert spark.read.parquet(out).count() == 2 * len(batch)


def test_stream_dedup_equals_batch(spark):
    """dropDuplicatesWithinWatermark on the stream must keep exactly
    the rows batch dropDuplicates keeps (static input, so nothing is
    watermark-evicted; keys are unique per (user_id, ts, event_type))."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        dedup_event_stream,
        run_dedup_to_memory_sink,
    )

    batch = {
        (r["user_id"], r["ts"], r["event_type"]): r["event_id"]
        for r in dedup_event_stream(load_table(spark, SF_DIR, "events")).collect()
    }
    streamed = run_dedup_to_memory_sink(spark, SF_DIR).collect()
    stream = {
        (r["user_id"], r["ts"], r["event_type"]): r["event_id"] for r in streamed
    }
    assert len(streamed) == len(stream)  # no duplicate keys survived
    assert set(stream) == set(batch)
    assert len(batch) > 0


def test_native_session_windows_stream_equals_batch(spark):
    """The native session_window operator must produce the SAME
    sessions under streaming (watermarked, state-store-merged) as in
    batch -- and the batch form is oracle-gated (w4)."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        run_session_windows_to_memory_sink,
        session_window_counts,
    )

    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in session_window_counts(
            load_table(spark, SF_DIR, "events")
        ).collect()
    }
    stream = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in run_session_windows_to_memory_sink(spark, SF_DIR).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_rollup_cascade_stream_equals_batch(spark):
    """The hourly rollup computed off STREAM-maintained minute partials
    must equal the oracle-gated batch cascade (hr1_hypertable_rollup)."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries import (
        REGISTRY,
    )
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        run_rollup_cascade_to_memory_sink,
    )

    key = lambda r: (r["hour_start"], r["event_type"])  # noqa: E731
    val = lambda r: (r["n"], r["total_value"], r["n_minutes"])  # noqa: E731
    batch = {
        key(r): val(r)
        for r in REGISTRY["hr1_hypertable_rollup"].spark(spark, SF_DIR).collect()
    }
    stream = {
        key(r): val(r)
        for r in run_rollup_cascade_to_memory_sink(spark, SF_DIR).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_interval_join_stream_equals_batch(spark):
    """Stream-stream event-time range join (watermarked both sides)
    must emit exactly the oracle-gated batch pair set."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries import (
        REGISTRY,
    )
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        run_interval_join_to_memory_sink,
    )

    batch = {
        (r["purchase_id"], r["click_id"])
        for r in REGISTRY["aj2_interval_join_pairs"].spark(spark, SF_DIR).collect()
    }
    stream = {
        (r["purchase_id"], r["click_id"])
        for r in run_interval_join_to_memory_sink(spark, SF_DIR).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_cdc_snapshot_stream_equals_batch(spark):
    """The streaming last-writer-wins snapshot must equal the batch
    m8 replay (same winner under the same (ts, event_id) key, same
    tombstone semantics) -- and agree with the oracle-gated m8 rollup
    when summarized the same way."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        cdc_snapshot_stream,
        run_cdc_snapshot_to_memory_sink,
    )

    sf = "/root/testdata/sf0.001"
    streamed = run_cdc_snapshot_to_memory_sink(spark, sf).collect()
    batch = cdc_snapshot_stream(
        spark.read.parquet(f"{sf}/events.parquet")
    ).collect()
    key = lambda r: (r["user_id"], r["final_type"], r["value"])  # noqa: E731
    assert sorted(map(key, streamed)) == sorted(map(key, batch))
    assert len(streamed) == len({r["user_id"] for r in streamed})


def test_countmin_grid_stream_equals_batch(spark):
    """Streaming sketch maintenance: the complete-mode counter grid
    must match the batch-built grid cell for cell (the merge law live,
    not just asserted on splits)."""
    from pyspark.sql import functions as F

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_profile as qp,
    )
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        countmin_grid_stream,
        run_countmin_grid_to_memory_sink,
    )

    sf = "/root/testdata/sf0.001"
    streamed = run_countmin_grid_to_memory_sink(spark, sf, qp._CM_D).collect()
    batch = countmin_grid_stream(
        spark.read.parquet(f"{sf}/events.parquet"), qp._CM_D
    ).collect()
    as_map = lambda rows: {(r["j"], r["bucket"]): r["c"] for r in rows}  # noqa: E731
    sm, bm = as_map(streamed), as_map(batch)
    assert sm == bm
    assert len(sm) <= qp._CM_D * 256


def test_ohlc_bars_stream_equals_batch(spark):
    """Streaming OHLC maintenance must equal the batch hr2 bars bar
    for bar -- open/close deterministic under streaming arrival order
    because both engines rank by the same (epoch, event_id) key."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.events import (
        ohlc_bars_stream,
        run_ohlc_bars_to_memory_sink,
    )

    sf = "/root/testdata/sf0.001"
    streamed = run_ohlc_bars_to_memory_sink(spark, sf).collect()
    batch = ohlc_bars_stream(
        spark.read.parquet(f"{sf}/events.parquet")
    ).collect()
    key = lambda r: (  # noqa: E731
        r["event_type"], r["bar_ts"], r["open"], r["high"],
        r["low"], r["close"], r["n_ticks"],
    )
    assert sorted(map(key, streamed)) == sorted(map(key, batch))


def test_streaming_mongo_wire_sink_exactly_once_across_restart(spark, tmp_path):
    """foreachBatch -> wire-protocol Mongo sink, driven end to end over
    real TCP against tools/fake_mongod.py: batch 0 lands, the query
    STOPS (checkpointed), new data arrives, a restarted query processes
    only the new file as batch 1 -- and a forced redelivery of batch 1
    (exactly what Spark does when a crash lands between the sink write
    and the checkpoint commit: same batchId, same rows) leaves the
    visible rows unchanged.  Total readback equals the input set
    exactly once."""
    import json as _json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.fake_mongod import FakeMongod

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.mongo_wire import MongoWireClient
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.sinks import mongodb_wire_foreach_batch

    indir = tmp_path / "stream_in"
    indir.mkdir()
    ckpt = str(tmp_path / "ckpt_mongo")

    def add_file(name, ids):
        with open(indir / name, "w") as f:
            for i in ids:
                f.write(_json.dumps({"id": i, "payload": f"p{i}"}) + "\n")

    with FakeMongod() as srv:
        writer = mongodb_wire_foreach_batch("127.0.0.1", srv.port, "sdb", "ev")

        def run_available():
            q = (
                spark.readStream.schema("id long, payload string")
                .json(str(indir))
                .writeStream.foreachBatch(writer)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180)

        add_file("a.json", range(0, 50))
        run_available()  # batch 0
        add_file("b.json", range(50, 100))
        run_available()  # restart from checkpoint: ONLY b.json, batch 1

        with MongoWireClient("127.0.0.1", srv.port) as c:
            ids_b0 = sorted(d["id"] for d in c.find_all("sdb", "ev_0"))
            ids_b1 = sorted(d["id"] for d in c.find_all("sdb", "ev_1"))
        assert ids_b0 == list(range(0, 50))  # restart did NOT reprocess a.json
        assert ids_b1 == list(range(50, 100))

        # Worst-case redelivery: crash after the sink wrote batch 1 but
        # before the commit -- Spark re-invokes foreachBatch with the
        # SAME batchId and rows.  The batch-keyed overwrite absorbs it.
        replay = spark.read.schema("id long, payload string").json(
            str(indir / "b.json")
        )
        writer(replay, 1)
        with MongoWireClient("127.0.0.1", srv.port) as c:
            total = sorted(
                d["id"]
                for coll in ("ev_0", "ev_1")
                for d in c.find_all("sdb", coll)
            )
        assert total == list(range(100))  # exactly once, no dup, no loss


def test_event_order_key_domain(spark):
    """The arithmetic (epoch_micros * 10^12 + event_id) ordering key
    used by hr2 / the CDC + OHLC streaming twins equals (ts, event_id)
    lexicographic order exactly when 0 <= event_id < 10^12 and the key
    fits decimal(38,0); pin that the events table satisfies both."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    bad = ev.filter(
        (F.col("event_id") < 0)
        | (F.col("event_id") >= 10**12)
        | (F.unix_micros(F.col("ts").cast("timestamp")) < 0)
    ).count()
    assert bad == 0
