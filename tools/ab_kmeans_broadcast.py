"""A/B the Lloyd k-means centroid-shipping strategies across K.

VERDICT r13 #1: the literal-argmin trainer embeds K*dim expression
nodes in the plan -- right at coarse K=8, but production IVF coarse
quantizers train K in the thousands, where the plan must blow
analyzer/codegen budgets.  The broadcast-centroid variant ships the
same integers as ONE broadcast row (plan O(1) in K).  This measures
the crossover: for each K, both strategies run interleaved round-robin
in one session (a mid-run environment shift hits every variant
equally), timing the FULL train-and-summarize job (3 Spark jobs: seed
+ 1 Lloyd + final).  Reports min + trimmed wall per (K, strategy) and
a rough analysis-time probe (schema resolution wall) that isolates
plan-size cost from execution cost.

K=512 literal is expected to be deep in analyzer territory (512*64 =
32k literal array nodes per distance tree); a per-case watchdog skips
a variant cleanly if it exceeds ``--cap`` seconds so the grid always
completes.

Usage: python tools/ab_kmeans_broadcast.py [sf_dir] [n_passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

KS = (8, 64, 512)
# Production-coarse-quantizer row (VERDICT r14 #3): broadcast ONLY --
# literal at K=4096 means 4096*64 = 262k plan nodes per distance tree,
# already proven hopeless at 512 -- and on an UPSAMPLED corpus (the
# sf0.1 embeddings table is 2k vectors; 64 deterministic perturbed
# replicas give 128k, ~31 points/cluster, so the K-row centroid update
# and the broadcast-assignment scan both do real work).
BIG_KS = (4096,)
BIG_K_REPLICAS = 64
CAP_S = 300.0  # per (K, strategy) wall budget; over-cap variants skip


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # Which strategies run at BIG_KS (argv[3], comma-separated).
    # literal is excluded by design (262k plan nodes, proven hopeless
    # at 512); broadcast's one 828 s datapoint is already on record,
    # so re-runs typically measure einsum alone.
    big_strats = tuple(
        (sys.argv[3] if len(sys.argv) > 3 else "broadcast,einsum").split(",")
    )

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import queries_vectors as qv
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark(app_name="ab_kmeans_broadcast")
    emb = qv._integerized_emb(spark, sf_dir)
    n_vecs = emb.count()  # also warms the scan

    # Upsampled corpus for the K=4096 row: replica r shifts every
    # component by r (deterministic, integer-exact, spread over the
    # value range) -- same schema, 64x the rows.
    big = emb.select(
        F.explode(F.sequence(F.lit(0), F.lit(BIG_K_REPLICAS - 1))).alias("r"),
        "vec_id", "v",
    ).select(
        (F.col("vec_id") * BIG_K_REPLICAS + F.col("r")).alias("vec_id"),
        F.expr("transform(v, x -> x + r * 37)").alias("v"),
    )
    n_big = big.count()

    walls: dict[tuple[int, str], list[float]] = {}
    skipped: set[tuple[int, str]] = set()
    analysis: dict[tuple[int, str], float] = {}
    for p in range(n_passes):
        for k in KS + BIG_KS:
            strats = (
                big_strats
                if k in BIG_KS
                else ("literal", "broadcast", "einsum")
            )
            corpus = big if k in BIG_KS else emb
            for strat in strats:
                key = (k, strat)
                if key in skipped:
                    continue
                t0 = time.time()
                df = qv._kmeans_train(corpus, k, 2, strategy=strat)
                rows = df.count()
                dt = time.time() - t0
                walls.setdefault(key, []).append(dt)
                print(
                    f"# pass{p} K={k} {strat}: {dt:.2f}s ({rows} clusters)",
                    file=sys.stderr,
                )
                if dt > CAP_S:
                    skipped.add(key)
                    print(f"# K={k} {strat} over cap, skipping", file=sys.stderr)
        if p == 0:
            # Analysis-only probe once, on the ASSIGNMENT expression
            # alone with synthetic centroids (no training jobs): the
            # literal argmin's K*dim plan nodes pay at analysis/codegen
            # time, which is exactly what this isolates.  The training
            # walls above can't: the literal trainer interleaves eager
            # driver collects with lazy analysis.
            from pyspark.sql import functions as F

            for k in KS:
                cents = [
                    [(i * 31 + d) % 2000 for d in range(64)]
                    for i in range(k)
                ]
                if (k, "literal") not in skipped:
                    t0 = time.time()
                    emb.withColumn("m", qv._kmeans_argmin("v", cents)).schema
                    analysis[(k, "literal")] = time.time() - t0
                if (k, "broadcast") not in skipped:
                    cdf = spark.createDataFrame(
                        [(i, cents[i]) for i in range(k)],
                        "cid long, v array<bigint>",
                    ).agg(
                        F.array_sort(
                            F.collect_list(F.struct("cid", "v"))
                        ).alias("cents")
                    )
                    t0 = time.time()
                    emb.crossJoin(F.broadcast(cdf)).withColumn(
                        "m", qv._kmeans_argmin_bcast()
                    ).schema
                    analysis[(k, "broadcast")] = time.time() - t0

    def tmean(ts: list[float]) -> float:
        ts = sorted(ts)
        core = ts[: max(1, len(ts) - 1)]  # drop the max (warm-up/noise)
        return sum(core) / len(core)

    out = {
        "sf_dir": sf_dir,
        "n_vecs": int(n_vecs),
        "n_vecs_bigk": int(n_big),
        "big_ks_broadcast_only": list(BIG_KS),
        "n_passes": n_passes,
        "results": [
            {
                "K": k,
                "strategy": strat,
                "wall_min_s": round(min(ts), 3),
                "wall_tmean_s": round(tmean(ts), 3),
                "runs": [round(t, 3) for t in ts],
                "analysis_probe_s": round(analysis.get((k, strat), -1.0), 3),
                "skipped_after_cap": (k, strat) in skipped,
            }
            for (k, strat), ts in sorted(walls.items())
        ],
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
