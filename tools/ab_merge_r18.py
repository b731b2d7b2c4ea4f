"""Same-JVM A/B of the cow-merge upsert formulation (r18 opt round):

OLD: merge_upsert(affected, src, k) -- one FULL-OUTER join on the key
     (not broadcastable by any planner), so the whole affected slice
     is exchanged + sorted to attach a delta-sized source.
NEW: affected LEFT-ANTI broadcast(src distinct keys) UNION src -- the
     affected slice streams scan->join->union with zero exchange.

Staged like m22: md5-keyed orders (hash keys defeat range stats, every
file affected), source = the %101 price updates + %103 inserts.  Both
formulations noop-written alternately N times in ONE session; row-set
equality asserted with an order-insensitive hash first.  Explains go
to plans/r18/cow_merge_upsert_{before,after}.txt.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.audits import (  # noqa: E402
    merge_upsert,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries import (  # noqa: E402
    _t,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_merge_r18")
    import tempfile

    work = tempfile.mkdtemp(prefix="ab_merge_")
    orders = _t(spark, sf_dir, "orders").select(
        F.md5(F.col("o_orderkey").cast("string")).alias("k"),
        "o_orderkey", "o_orderpriority", "o_totalprice",
    )
    orders.repartition(12).write.parquet(f"{work}/target")
    affected = spark.read.parquet(f"{work}/target")
    updates = orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(50000.0)
    )
    inserts = orders.filter(F.col("o_orderkey") % 103 == 0).select(
        F.md5((F.col("o_orderkey") + 20000000).cast("string")).alias("k"),
        (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
        "o_orderpriority", "o_totalprice",
    )
    src = updates.unionByName(inserts).localCheckpoint(eager=True)

    old = merge_upsert(affected, src.select(affected.columns), "k")
    # shipped formulation: the matched keys come back from the
    # detection collect as driver rows, so the anti-join build side is
    # a broadcast LocalRelation (data, not a re-evaluated subtree and
    # not a several-thousand-literal isin -- measured 2.2 s/action of
    # pure planning at 3k literals vs 0.6 s for this join)
    mk = [r["_sk"] for r in src.select(F.col("k").alias("_sk")).distinct().collect()]
    sk = F.broadcast(
        spark.createDataFrame([(v,) for v in mk], "_sk string")
    )
    new = affected.join(
        sk, affected["k"] == F.col("_sk"), "left_anti"
    ).unionByName(src.select(affected.columns)).coalesce(12)

    def row_hash(df):
        return df.select(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    ho, hn = row_hash(old), row_hash(new)
    print(f"# rowset old: n={ho['n']} h={ho['h']}")
    print(f"# rowset new: n={hn['n']} h={hn['h']}")
    assert (ho["n"], ho["h"]) == (hn["n"], hn["h"]), "ROW SETS DIFFER"

    os.makedirs(f"{REPO}/plans/r18", exist_ok=True)
    with open(f"{REPO}/plans/r18/cow_merge_upsert_before.txt", "w") as f:
        f.write(old._sc._jvm.PythonSQLUtils.explainString(
            old._jdf.queryExecution(), "formatted"))
    with open(f"{REPO}/plans/r18/cow_merge_upsert_after.txt", "w") as f:
        f.write(new._sc._jvm.PythonSQLUtils.explainString(
            new._jdf.queryExecution(), "formatted"))

    def noop(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both once (codegen/JIT), then alternate
    noop(old), noop(new)
    walls = {"old": [], "new": []}
    for _ in range(4):
        spark.sparkContext.setJobDescription("ab old full-outer")
        walls["old"].append(noop(old))
        spark.sparkContext.setJobDescription("ab new anti+union")
        walls["new"].append(noop(new))
    for k, ts in walls.items():
        print(f"# {k}: min {min(ts):.3f}s  walls {[round(t, 3) for t in ts]}")
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
