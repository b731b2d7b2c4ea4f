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


def test_pq_anchor_self_encoding_and_code_range(spark):
    """PQ invariants the oracle's hash can't articulate: a codebook
    anchor must encode to ITSELF in every subspace (its distance to
    its own subvector is exactly 0 on the integer grid), every code
    must lie in [0, C), and ADC distances are non-negative with the
    query's nearest-by-ADC neighbors carrying strictly smaller scores
    than the farthest."""
    import __spark_entry__ as ent
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_vectors as qv,
    )

    rows = ent.queries()["v9_pq_encode_adc"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_id = {r["vec_id"]: r for r in rows}
    for c in range(qv._PQ_C):
        codes = [int(x) for x in by_id[c]["code_str"].split("|")]
        assert codes == [c] * qv._PQ_S, (c, codes)
    for r in rows:
        codes = [int(x) for x in r["code_str"].split("|")]
        assert len(codes) == qv._PQ_S
        assert all(0 <= x < qv._PQ_C for x in codes)
        assert r["adc_dist"] >= 0
    # The query vector's own row should land in the best ADC decile:
    # its encoding is the nearest codeword chain to itself.
    ranked = sorted(rows, key=lambda r: (r["adc_dist"], r["vec_id"]))
    pos = next(
        i for i, r in enumerate(ranked) if r["vec_id"] == qv._PQ_QUERY_ID
    )
    assert pos < len(ranked) / 10, pos
