"""A/B dd13's scoring-join strategy (VERDICT r10 #7).

dd13_containment_pairs is the one registry query planning
SortMergeJoins: the capped pair set joins the corpus-sized ``sizes``
frame twice.  The pair set is PAIR_DF_CAP-bounded per shingle but
corpus-proportional in total, so broadcasting it is a size bet this
measures instead of guessing.  Variants, interleaved round-robin in
one session:

  smj        -- the shipped plan (sizes joined plainly, Spark picks)
  bcast_pairs -- broadcast the aggregated pair set into both joins
  bcast_sizes -- broadcast the sizes frame into both joins

At 100 TB the pair set can exceed broadcast limits and sizes is
doc-count-sized (also too big), so whichever wins here, the shipped
choice must be justified in PERF.md with these numbers.

Usage: python tools/ab_dd13.py [sf_dir] [n_passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import queries_dedup as qd

    spark = get_spark(app_name="ab_dd13")

    def build(strategy: str):
        """Rebuild dd13's plan up to `common`+`sizes`, then score with
        the requested join strategy (mirrors q_containment_pairs)."""
        TX = qd.TX
        docs = qd._t(spark, sf_dir, "documents").select(
            "doc_id", F.lower(F.trim("text")).alias("text")
        )
        hosts = docs.filter(F.col("doc_id") < 250).select(
            F.col("doc_id").alias("hid"), F.col("text").alias("htext")
        )
        snips = (
            docs.filter(F.col("doc_id") % 11 == 3)
            .select("doc_id", ((F.col("doc_id") * 7) % 250).alias("hid"))
            .join(F.broadcast(hosts), "hid")
            .select(
                "doc_id",
                F.concat_ws(
                    " ", F.slice(F.split("htext", " "), 1, 12)
                ).alias("text"),
            )
        )
        derived = qd._spread(
            docs.filter(F.col("doc_id") % 11 != 3).unionByName(snips)
        )
        sh = derived.select(
            "doc_id",
            F.explode(TX.word_shingles_arrow(F.col("text"), 3)).alias("shingle"),
        )
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        common = (
            sh.groupBy("shingle")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") > 1) & (F.size("ids") <= qd.PAIR_DF_CAP))
            .select(F.posexplode("ids").alias("i", "id_a"), "ids")
            .select(
                "id_a",
                F.explode(
                    F.slice(F.col("ids"), F.col("i") + 2, F.size("ids"))
                ).alias("id_b"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
        sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
        if strategy == "bcast_pairs":
            j = F.broadcast(common).join(sa, "id_a")
            j = F.broadcast(j).join(sb, "id_b")
        elif strategy == "bcast_sizes":
            j = common.join(F.broadcast(sa), "id_a").join(
                F.broadcast(sb), "id_b"
            )
        else:
            j = common.join(sa, "id_a").join(sb, "id_b")
        a_first = (F.col("na") < F.col("nb")) | (
            (F.col("na") == F.col("nb")) & (F.col("id_a") < F.col("id_b"))
        )
        return j.select(
            F.when(a_first, F.col("id_a")).otherwise(F.col("id_b")).alias("id_small"),
            F.when(a_first, F.col("id_b")).otherwise(F.col("id_a")).alias("id_big"),
            "n_common",
            F.least("na", "nb").cast("bigint").alias("n_small"),
        ).filter(10 * F.col("n_common") >= 9 * F.col("n_small"))

    variants = ["smj", "bcast_pairs", "bcast_sizes"]
    walls = {v: [] for v in variants}
    counts = {}
    for p in range(n_passes):
        for v in variants:
            t0 = time.time()
            n = build(v).count()
            dt = time.time() - t0
            walls[v].append(dt)
            counts[v] = n
            print(f"# pass{p} {v}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    assert len(set(counts.values())) == 1, counts  # identical results
    plans = {}
    for v in variants:
        s = build(v)._jdf.queryExecution().executedPlan().toString()
        plans[v] = {
            "smj": s.count("SortMergeJoin"),
            "bhj": s.count("BroadcastHashJoin"),
        }
    print(json.dumps({
        v: {
            "wall_min_s": round(min(walls[v]), 2),
            "wall_all": [round(x, 2) for x in walls[v]],
            **plans[v],
        } for v in variants
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
