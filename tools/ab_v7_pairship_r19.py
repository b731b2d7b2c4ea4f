"""Same-JVM A/B of v7's pair-shipping restructure at SCALE (VERDICT
r18 next #2).

OLD (shipped): candidates BroadcastNestedLoopJoin the 5 query rows,
so EVERY candidate x query output row carries BOTH 768-wide double
vectors into the fused cosine pandas UDF -- per candidate, 5 x 2 x
768 doubles cross the Arrow boundary (~61 KB).
NEW: the 5 query vectors collect to the driver once (5 x 768) and a
single mapInPandas over the candidates computes all 5 cosines per
batch -- per candidate, 768 doubles cross once (~6 KB, ~10x less).

Numeric identity: the new kernel runs the SAME einsum signature
("ij,ij->i") over the same float64 rows -- the query side as a
broadcast_to view, elementwise row-dot in both -- and rounding stays
in Spark (F.round, HALF_UP), so results are bit-identical, asserted
by order-insensitive hash on the FULL query output (window applied)
at every SF given.

Usage: python tools/ab_v7_pairship_r19.py [n_ab] [sf_dir ...]
Default: 4 passes at /tmp/sf1 (generated via bench._ensure_sf1) with
hash checks at sf0.001/sf0.01/sf0.1 first.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions import (  # noqa: E402
    vectors as V,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries import (  # noqa: E402
    _spread,
    _t,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_vectors import (  # noqa: E402
    WIDE_DIM,
    _widen_spark,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import (  # noqa: E402
    get_spark,
)


def _old_sims(spark, sf_dir):
    base = _t(spark, sf_dir, "embeddings")
    q = base.filter(F.col("vec_id") < 5).select(
        "vec_id", _widen_spark().alias("v")
    ).alias("q")
    c = _spread(base).select("vec_id", _widen_spark().alias("v")).alias("c")
    return c.join(
        F.broadcast(q), F.col("q.vec_id") != F.col("c.vec_id")
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(
            V.cosine(F.col("q.v"), F.col("c.v"), dim=WIDE_DIM), 6
        ).alias("cos_sim"),
    )


def _new_sims(spark, sf_dir):
    base = _t(spark, sf_dir, "embeddings")
    qrows = sorted(
        base.filter(F.col("vec_id") < 5)
        .select("vec_id", _widen_spark().alias("v"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    qids = [int(r["vec_id"]) for r in qrows]
    qvecs = [list(r["v"]) for r in qrows]
    cand = _spread(base).select("vec_id", _widen_spark().alias("v"))

    def score(batches):
        import numpy as np
        import pandas as pd

        Q = [np.asarray(v, dtype=np.float64) for v in qvecs]
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["v"].to_numpy())
            ids = pdf["vec_id"].to_numpy()
            parts = []
            for qid, qv in zip(qids, Q):
                B = np.broadcast_to(qv, C.shape)
                num = np.einsum("ij,ij->i", C, B)
                na = np.sqrt(np.einsum("ij,ij->i", C, C))
                nb = np.sqrt(np.einsum("ij,ij->i", B, B))
                cos = num / (na * nb)
                m = ids != qid
                parts.append(pd.DataFrame({
                    "query_id": np.full(int(m.sum()), qid, dtype=np.int64),
                    "neighbor_id": ids[m].astype(np.int64),
                    "cos_sim": cos[m],
                }))
            yield pd.concat(parts, ignore_index=True)

    raw = cand.mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    return raw.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim")
    )


def _topk(sims):
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


def row_hash(df):
    r = df.select(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (r["h"], r["n"])


def main() -> int:
    n_ab = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab_v7_pairship")

    # exactness gates at the oracle-checked SFs (full query, topk)
    for sf_dir in (
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        ho = row_hash(_topk(_old_sims(spark, sf_dir)))
        hn = row_hash(_topk(_new_sims(spark, sf_dir)))
        print(f"# {sf_dir}: old={ho} new={hn}")
        assert ho == hn, f"top-k diverged at {sf_dir}"

    # scale block: sf1 (bench's own 10x generator, cached)
    sys.path.insert(0, REPO)
    import bench as bench_mod

    sf1 = bench_mod._ensure_sf1(spark, "/root/testdata/sf0.1")
    assert sf1, "sf1 generation failed"
    ho = row_hash(_topk(_old_sims(spark, sf1)))
    hn = row_hash(_topk(_new_sims(spark, sf1)))
    print(f"# sf1 topk: old={ho} new={hn}")
    assert ho == hn, "top-k diverged at sf1"

    def noop(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    olds, news = [], []
    for i in range(n_ab):
        spark.sparkContext.setJobDescription(f"v7 old pass {i}")
        t_old = noop(_old_sims(spark, sf1))
        spark.sparkContext.setJobDescription(f"v7 new pass {i}")
        t_new = noop(_new_sims(spark, sf1))
        olds.append(round(t_old, 3))
        news.append(round(t_new, 3))
        print(f"# sf1 pass {i}: old={t_old:.3f}s new={t_new:.3f}s")
    print(
        f"# sf1 min old={min(olds):.3f}s new={min(news):.3f}s "
        f"speedup={min(olds) / min(news):.2f}x"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
