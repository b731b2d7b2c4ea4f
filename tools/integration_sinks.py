"""One-shot integration probe for the two environment-gated sinks.

Run in ANY environment: it attempts each real backend end-to-end and
prints a PASS / SKIP(reason) transcript.  In environments that ship
mongod / a Delta or Iceberg jar it is the full e2e proof (reference
parity: main.ipynb:1269-1270 mongoimport load; operators/audits.py
merge_statement); in the build sandbox it documents exactly which
capability is absent and that everything up to the backend boundary
works.

Usage: python tools/integration_sinks.py   (writes transcript to stdout)
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def probe_mongodb(spark) -> str:
    """Full round-trip when a server exists: write via the Spark Mongo
    connector, read back, compare counts."""
    import importlib.util

    if shutil.which("mongod") is None:
        return "SKIP: no mongod binary on PATH (sandbox has no MongoDB server)"
    if importlib.util.find_spec("pymongo") is None:
        return "SKIP: pymongo not installed (cannot verify server contents)"
    import subprocess
    import tempfile
    import time

    import pymongo

    dbpath = tempfile.mkdtemp(prefix="mongo_e2e_")
    proc = subprocess.Popen(
        ["mongod", "--dbpath", dbpath, "--port", "27117", "--bind_ip", "127.0.0.1"],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        uri = "mongodb://127.0.0.1:27117"
        client = pymongo.MongoClient(uri, serverSelectionTimeoutMS=10_000)
        for _ in range(50):
            try:
                client.admin.command("ping")
                break
            except Exception:
                time.sleep(0.2)
        from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.sinks import write_mongodb

        df = spark.range(100).selectExpr("id AS _id", "id * 2 AS val")
        write_mongodb(df, uri=uri, database="osm", collection="e2e")
        n = client["osm"]["e2e"].count_documents({})
        assert n == 100, f"round-trip count {n} != 100"
        return "PASS: 100-row write + pymongo readback"
    finally:
        proc.terminate()
        proc.wait(timeout=20)
        shutil.rmtree(dbpath, ignore_errors=True)


def probe_mongodb_wire(spark) -> str:
    """Wire-protocol round trip -- runs in EVERY environment: the
    engine's own OP_MSG/BSON client sink (sources/mongo_wire.py)
    against the in-repo TCP server (tools/fake_mongod.py), real bytes
    on a real socket; a mongod-equipped environment can point the same
    sink at a live server unchanged."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.sinks import (
        read_mongodb_wire,
        write_mongodb_wire,
    )
    from tools.fake_mongod import FakeMongod

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_src = docs.count()
    with FakeMongod() as srv:
        n1 = write_mongodb_wire(
            docs, "127.0.0.1", srv.port, "osm", "documents", mode="overwrite"
        )
        n2 = write_mongodb_wire(
            docs, "127.0.0.1", srv.port, "osm", "documents", mode="overwrite"
        )
        back = read_mongodb_wire(
            spark, "127.0.0.1", srv.port, "osm", "documents", schema=docs.schema
        )
        n_back = back.count()
        same = sorted(map(tuple, back.collect())) == sorted(
            map(tuple, docs.collect())
        )
    assert n1 == n2 == n_back == n_src, (n1, n2, n_back, n_src)
    assert same, "readback rows differ from source rows"
    return (
        f"PASS: {n_src}-row distributed OP_MSG write + overwrite-idempotence "
        f"+ readback value equality (port {srv.port})"
    )


def probe_merge(spark) -> str:
    """Real MERGE INTO when a transactional catalog exists."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.audits import merge_upsert_into

    has_delta = False
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.delta.DeltaLog"
        )
        has_delta = True
    except Exception:
        pass
    fmt = "delta" if has_delta else "parquet"
    spark.sql("DROP TABLE IF EXISTS _merge_e2e")
    spark.range(10).selectExpr("id AS k", "id AS v").write.format(fmt).saveAsTable(
        "_merge_e2e"
    )
    src = spark.range(5, 15).selectExpr("id AS k", "id * 10 AS v")
    try:
        merge_upsert_into(spark, "_merge_e2e", src, key="k")
        rows = spark.table("_merge_e2e").count()
        assert rows == 15, f"post-merge count {rows} != 15"
        return f"PASS: MERGE INTO against {fmt} table (15 rows post-merge)"
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        return (
            "SKIP: no transactional-format jar (MERGE unsupported on "
            f"built-in parquet tables): {msg}"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS _merge_e2e")


def probe_merge_cow(spark) -> str:
    """Transactional MERGE via the engine's own copy-on-write table
    (sources/cow_table.py) -- runs in EVERY environment: commit-log
    snapshot, file-pruned rewrite, atomic commit, time travel."""
    import tempfile

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        CowTable,
    )

    with tempfile.TemporaryDirectory(prefix="cow_e2e_") as d:
        base = spark.range(1000).repartition(8).selectExpr("id AS k", "id AS v")
        t = CowTable.create(spark, f"{d}/t", base)
        src = spark.range(990, 1010).selectExpr("id AS k", "id * 10 AS v")
        doc = t.merge(src, "k")
        n = t.read().count()
        assert n == 1010, f"post-merge count {n} != 1010"
        assert t.read(0).count() == 1000, "time travel to v0 broken"
        assert doc["files_kept"] + doc["files_rewritten"] == 8
        return (
            f"PASS: MERGE on CowTable (1010 rows post-merge; "
            f"{doc['files_rewritten']}/8 files rewritten, "
            f"{doc['files_kept']} carried by reference; v0 time travel ok)"
        )


def probe_mongodb_wire_streaming(spark) -> str:
    """Structured Streaming foreachBatch -> wire sink with a mid-stream
    restart: batch 0, checkpointed stop, new file, restarted query
    processes only batch 1, then a forced same-batchId redelivery (the
    crash-between-write-and-commit case) is absorbed by the batch-keyed
    overwrite.  Visible rows must equal the input exactly once."""
    import json as _json
    import tempfile

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.mongo_wire import MongoWireClient
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.sinks import mongodb_wire_foreach_batch
    from tools.fake_mongod import FakeMongod

    work = tempfile.mkdtemp(prefix="stream_sink_")
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    ckpt = os.path.join(work, "ckpt")

    def add_file(name, ids):
        with open(os.path.join(indir, name), "w") as f:
            for i in ids:
                f.write(_json.dumps({"id": i}) + "\n")

    try:
        with FakeMongod() as srv:
            writer = mongodb_wire_foreach_batch("127.0.0.1", srv.port, "sdb", "ev")

            def run_available():
                q = (
                    spark.readStream.schema("id long")
                    .json(indir)
                    .writeStream.foreachBatch(writer)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(180)

            add_file("a.json", range(0, 200))
            run_available()
            add_file("b.json", range(200, 300))
            run_available()  # restart: only b.json (batch 1)
            writer(  # forced redelivery of batch 1, same rows
                spark.read.schema("id long").json(os.path.join(indir, "b.json")), 1
            )
            with MongoWireClient("127.0.0.1", srv.port) as c:
                total = sorted(
                    d["id"]
                    for coll in ("ev_0", "ev_1")
                    for d in c.find_all("sdb", coll)
                )
        assert total == list(range(300)), "not exactly-once"
        return (
            "PASS: foreachBatch wire sink -- checkpointed restart processed "
            "only the new batch; forced same-batchId redelivery absorbed by "
            "batch-keyed overwrite; 300 rows visible exactly once"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark

    spark = get_spark(app_name="sinks_e2e", master="local[4]", shuffle_partitions=4)
    print("# sinks integration probe")
    import pyspark

    print(f"pyspark={pyspark.__version__}")
    for name, probe in (
        ("mongodb_wire_sink", probe_mongodb_wire),
        ("mongodb_wire_streaming_sink", probe_mongodb_wire_streaming),
        ("mongodb_connector_sink", probe_mongodb),
        ("merge_into", probe_merge),
        ("merge_cow", probe_merge_cow),
    ):
        try:
            print(f"{name}: {probe(spark)}")
        except Exception:
            print(f"{name}: FAIL\n{traceback.format_exc()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
