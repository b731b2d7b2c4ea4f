"""Sink round-trip tests: JSON and parquet writes preserve the
document set (reference S3 newline-JSON sink + count reconciliation,
main.ipynb cell 36)."""

from __future__ import annotations

import os

from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators import shape_documents
from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.osm_xml import read_osm_elements
from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.sinks import (
    write_json,
    write_parquet,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample.osm")


def test_json_roundtrip(spark, tmp_path):
    docs = shape_documents(read_osm_elements(spark, FIXTURE))
    out = str(tmp_path / "docs_json")
    write_json(docs, out)
    # JSON omits null fields per line; read back with the canonical
    # schema (the reference's mongoimport is schema-on-read too).
    back = spark.read.schema(docs.schema).json(out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    ids = {r["_id"] for r in back.select("_id").collect()}
    assert ids == {r["_id"] for r in docs.select("_id").collect()}


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    docs = shape_documents(read_osm_elements(spark, FIXTURE))
    out = str(tmp_path / "docs_parquet")
    write_parquet(docs, out, partition_by=["doc_type"], sort_by="_id")
    back = spark.read.parquet(out)
    assert back.count() == 8
    # Partition pruning path exists: doc_type is a partition column.
    assert back.filter(back.doc_type == "node").count() == 5
    assert [f.name for f in os.scandir(out) if f.is_dir()] != []


def test_mongodb_sink_wiring(spark):
    """S4 Mongo sink: exercise the full write path through Spark's
    datasource resolution.  Without the connector jar the write must
    come back False (graceful optional dependency), never raise; with
    the jar present this becomes a real connection attempt, so the
    fake URI keeps it hermetic either way."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.sinks import (
        mongo_write_options,
        write_mongodb,
    )

    assert mongo_write_options("mongodb://h:27017", "osm", "docs") == {
        "connection.uri": "mongodb://h:27017",
        "database": "osm",
        "collection": "docs",
    }

    import pytest

    try:
        spark._jvm.java.lang.Class.forName(
            "com.mongodb.spark.sql.connector.MongoTableProvider"
        )
        pytest.skip("mongo connector present; needs a live server to test")
    except Exception:
        pass  # connector absent: the graceful-degradation path applies

    docs = shape_documents(read_osm_elements(spark, FIXTURE))
    # Must return False WITHOUT raising -- a blanket except here would
    # make the assertion unfalsifiable against sniffing regressions.
    ok = write_mongodb(
        docs, "mongodb://127.0.0.1:1/?connectTimeoutMS=200", "osm", "docs"
    )
    assert ok is False
