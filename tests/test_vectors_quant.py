"""Property tests for the int8 quantization op (v6): the float
reconstruction bound is engine-local (Spark rounds the decimal
rendering of a double, DuckDB the binary value, so near-half ratios
are not cross-engine-comparable) -- the oracle gates the integer
outputs, this pins the mathematical properties."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_int8_quantization_properties(spark):
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_vectors import (
        q_int8_quantization,
    )

    out = q_int8_quantization(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    # int8 range respected, scale positive
    assert all(r["q_max_abs"] <= 127 for r in rows)
    assert all(r["scale"] > 0 for r in rows)

    # Reconstruction bound: |x - q*scale| <= scale/2 (+ ulp slack) for
    # every element, computed in one engine.
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scaled = emb.withColumn(
        "scale",
        F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / F.lit(127.0),
    )
    err = F.transform(
        F.col("v"),
        lambda x: F.abs(x - F.round(x / F.col("scale")) * F.col("scale")),
    )
    viol = scaled.filter(
        F.array_max(err) > F.col("scale") * F.lit(0.5 + 1e-9)
    ).count()
    assert viol == 0
