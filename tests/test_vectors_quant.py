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


def _kmeans_rows(df):
    return sorted(
        (int(r["cluster_id"]), int(r["size"]), int(r["min_vec_id"]),
         int(r["inertia"]))
        for r in df.collect()
    )


def test_kmeans_literal_eq_broadcast(spark):
    """The two Lloyd strategies are the SAME function of the data: at
    K=8 (where both are cheap enough to run) the literal-argmin
    trainer and the broadcast-centroid trainer must produce identical
    per-cluster summaries -- sizes, min members, and integer inertia
    -- because every intermediate is exact integer arithmetic.  This
    is the gate that lets the K-threshold dispatch swap strategies
    without a semantics change."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_vectors as qv,
    )

    emb = qv._integerized_emb(spark, "/root/testdata/sf0.001")
    lit = qv._kmeans_train(emb, 8, 2, strategy="literal")
    bc = qv._kmeans_train(emb, 8, 2, strategy="broadcast")
    es = qv._kmeans_train(emb, 8, 2, strategy="einsum")
    assert _kmeans_rows(lit) == _kmeans_rows(bc)
    # r15: the BLAS einsum assignment computes the SAME integers
    # (float64 is exact below 2^53; argmin first-hit == struct-min
    # cid tie-break), so the K>512 dispatch is execution-only too.
    assert _kmeans_rows(es) == _kmeans_rows(bc)


def test_kmeans_dead_cluster_guard_fires_identically(spark):
    """Stage an ACTUAL dead cluster -- duplicate seed vectors, so the
    cid-tie-break funnels every member to the lower cid and the upper
    seed cluster empties after iteration 1 -- and pin that (a) both
    Spark strategies keep the dead cluster's previous centroid without
    diverging, and (b) the oracle SQL's mirrored guard (c1 LEFT JOIN
    coalesce) computes the same final assignment in DuckDB.  This is
    the exact scenario where an unguarded oracle would silently drop
    the cluster and assign its would-be members elsewhere."""
    import duckdb
    from pyspark.sql import functions as F  # noqa: F401
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_vectors as qv,
    )

    # vec 0 and vec 1 are identical -> seeds c0 == c1; every point is
    # equidistant to both, tie-break sends all to c0; c1 goes dead.
    data = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [10.0, 0.0]),
        (3, [0.0, 10.0]),
    ]
    emb = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    iv = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 1000.0D) AS BIGINT))"
        ).alias("v"),
    )
    lit = _kmeans_rows(qv._kmeans_train(iv, 2, 2, strategy="literal"))
    bc = _kmeans_rows(qv._kmeans_train(iv, 2, 2, strategy="broadcast"))
    es = _kmeans_rows(qv._kmeans_train(iv, 2, 2, strategy="einsum"))
    assert lit == bc
    assert es == bc  # dead-cluster guard + tie rule identical via BLAS
    # The guard is observable in the OUTPUT here: cluster 1 died in
    # iteration 1 (zero members), kept its seed centroid [0,0], and
    # then WON BACK the two origin points in the final assignment
    # (cluster 0's updated centroid moved to [2500,2500]).  An
    # unguarded engine (or oracle) would have no cluster 1 at all and
    # put all four points in cluster 0.
    assert [(r[0], r[1]) for r in lit] == [(0, 2), (1, 2)]

    con = duckdb.connect()
    import pandas as pd

    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": [d[0] for d in data],
             "embedding": [d[1] for d in data]}
        ),
    )
    oracle = con.execute(qv._kmeans_oracle_sql(2, dim=2)).fetchall()
    assert sorted(
        (int(a), int(b), int(c), int(d)) for a, b, c, d in oracle
    ) == lit


def test_ivfpq_search_invariants(spark):
    """IVF-PQ (v13) invariants the oracle's hash can't articulate:
    the candidate set is genuinely CELL-PRUNED (every neighbor's
    label is one of its query's nprobe probed cells -- recomputed
    here from the same centroid/cosine assignment), results are
    exactly top-k per query by ascending integer ADC with the
    vec_id tiebreak, and a probed-cell member that ties an anchor
    encodes consistently (ADC >= 0 always)."""
    from pyspark.sql import Window

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions import (
        vectors as V,
    )
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_vectors as qv,
    )

    sf = "/root/testdata/sf0.001"
    out = qv.q_ivf_pq_search(spark, sf).collect()
    assert len(out) == qv._IVFPQ_NQ * qv._IVFPQ_TOPK
    assert all(r["adc_dist"] >= 0 for r in out)

    # per-query: k rows, sorted by (adc_dist, neighbor_id)
    byq: dict = {}
    for r in out:
        byq.setdefault(r["query_id"], []).append(r)
    assert set(byq) == set(range(qv._IVFPQ_NQ))
    for q, rows in byq.items():
        assert len(rows) == qv._IVFPQ_TOPK
        key = [(r["adc_dist"], r["neighbor_id"]) for r in rows]
        assert key == sorted(key)

    # recompute the probe map independently and check cell pruning
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "label", V.as_double(F.col("embedding")).alias("v")
    )
    cents = qv._centroid_agg(emb.select("label", "v"), "label")
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("c_sim"), F.asc("label")
    )
    probes = (
        emb.filter(F.col("vec_id") < qv._IVFPQ_NQ)
        .select("vec_id", "v")
        .crossJoin(F.broadcast(cents))
        .withColumn("c_sim", V.cosine("v", "cvec", dim=qv.EMBED_DIM))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= qv._IVFPQ_NPROBE)
        .select("vec_id", "label")
        .collect()
    )
    allowed: dict = {}
    for r in probes:
        allowed.setdefault(r["vec_id"], set()).add(r["label"])
    nlabel = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in out:
        assert nlabel[r["neighbor_id"]] in allowed[r["query_id"]], (
            f"neighbor {r['neighbor_id']} outside probed cells of "
            f"query {r['query_id']}"
        )
