"""Same-JVM A/B of the r19 FUSED change-feed cow-merge write.

OLD (r18): the rewritten files' live rows are evaluated WIDE twice --
once by the data rewrite (anti-join + union) and once by the
change-set pre-image -- and the source plan twice more (union branch +
postimage/insert branch).
NEW (r19): every pre row classifies in one pass against broadcast
LocalRelation markers; each source row emits its data copy and change
copy from ONE evaluation (explode over the two change types); one
output stream carries both dispositions.

Staged like m22 (md5-keyed orders, %101 updates + %103 inserts + %97
deletes).  Row-set equality asserted first with order-insensitive
hashes (data rows AND change rows).  Both formulations noop-written
alternately N times in ONE session (this box's cross-run wall is
untrustworthy -- see PERF.md); explains go to
plans/r19/cdf_fused_{before,after}.txt.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries import (  # noqa: E402
    _t,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import (  # noqa: E402
    get_spark,
)


def _explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_ab = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab_cdf_fused_r19")
    import tempfile

    work = tempfile.mkdtemp(prefix="ab_cdf_")
    orders = _t(spark, sf_dir, "orders").select(
        F.md5(F.col("o_orderkey").cast("string")).alias("k"),
        "o_orderkey", "o_orderpriority", "o_totalprice",
    )
    orders.repartition(12).write.parquet(f"{work}/target")
    affected = spark.read.parquet(f"{work}/target")
    cols = affected.columns
    updates = orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(50000.0)
    )
    inserts = orders.filter(F.col("o_orderkey") % 103 == 0).select(
        F.md5((F.col("o_orderkey") + 20000000).cast("string")).alias("k"),
        (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
        "o_orderpriority", "o_totalprice",
    )
    src = updates.unionByName(inserts).select(cols)
    dels = orders.filter(F.col("o_orderkey") % 97 == 0).select("k")

    # matched key sets, as merge's detection collect returns them
    mk_src = sorted(
        r["k"] for r in updates.select("k").distinct().collect()
    )
    dk_vals = sorted(r["k"] for r in dels.distinct().collect())
    mk_all = sorted(set(mk_src) | set(dk_vals))

    def rel(vals, name):
        return F.broadcast(
            spark.createDataFrame([(v,) for v in vals], f"{name} string")
        )

    ct = "_change_type"

    # ---- OLD: two wide passes ---------------------------------------
    data_old = affected.join(
        rel(mk_all, "_mkk"), affected["k"] == F.col("_mkk"), "left_anti"
    ).unionByName(src).coalesce(12)
    # change set exactly as r18's _change_set with collected markers
    sk = rel(mk_src, "_ck").withColumn("_in_src", F.lit(True))
    dkm = rel(dk_vals, "_dck").withColumn("_in_del", F.lit(True))
    pre_tagged = affected.join(
        sk, affected["k"] == F.col("_ck"), "left"
    ).join(dkm, affected["k"] == F.col("_dck"), "left")
    pre_part = (
        pre_tagged.withColumn(
            ct,
            F.when(F.col("_in_src"), F.lit("update_preimage"))
            .when(F.col("_in_del"), F.lit("delete")),
        )
        .filter(F.col(ct).isNotNull())
        .select(*cols, ct)
    )
    tk = rel(mk_src, "_ck2").withColumn("_in_tbl", F.lit(True))
    src_part = (
        src.join(tk, src["k"] == F.col("_ck2"), "left")
        .withColumn(
            ct,
            F.when(F.col("_in_tbl"), F.lit("update_postimage")).otherwise(
                F.lit("insert")
            ),
        )
        .select(*cols, ct)
    )
    chg_old = pre_part.unionByName(src_part)

    # ---- NEW: one fused pass (shared marker relation -- the second
    # join reuses the first's broadcast build) ------------------------
    skm = rel(mk_src, "_ck").withColumn("_in_src", F.lit(True))
    dkm_n = rel(dk_vals, "_dck").withColumn("_in_del", F.lit(True))
    pre_branch = (
        affected.join(skm, affected["k"] == skm["_ck"], "left")
        .join(dkm_n, affected["k"] == F.col("_dck"), "left")
        .select(
            *cols,
            F.when(F.col("_in_src"), F.lit("update_preimage"))
            .when(F.col("_in_del"), F.lit("delete"))
            .alias(ct),
        )
    )
    src_branch = (
        src.join(skm, src["k"] == skm["_ck"], "left")
        .select(
            *cols,
            F.explode(F.array(
                F.lit(None).cast("string"),
                F.when(
                    skm["_in_src"], F.lit("update_postimage")
                ).otherwise(F.lit("insert")),
            )).alias(ct),
        )
    )
    fused = pre_branch.unionByName(src_branch).coalesce(12)

    # ---- row-set equality --------------------------------------------
    def row_hash(df):
        r = df.select(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (r["h"], r["n"])

    h_data_old = row_hash(data_old)
    h_data_new = row_hash(fused.filter(F.col(ct).isNull()).drop(ct))
    h_chg_old = row_hash(chg_old)
    h_chg_new = row_hash(fused.filter(F.col(ct).isNotNull()))
    print(f"# data rows old={h_data_old} new={h_data_new}")
    print(f"# chg  rows old={h_chg_old} new={h_chg_new}")
    assert h_data_old == h_data_new, "data row set diverged"
    assert h_chg_old == h_chg_new, "change row set diverged"

    # ---- plan captures -------------------------------------------------
    os.makedirs(os.path.join(REPO, "plans", "r19"), exist_ok=True)
    with open(
        os.path.join(REPO, "plans", "r19", "cdf_fused_before.txt"), "w"
    ) as f:
        f.write(
            "== r18 shape: TWO passes over the rewritten files ==\n"
            "-- pass 1: data rewrite (anti-join + union) --\n"
        )
        f.write(_explain_str(data_old))
        f.write("\n-- pass 2: change set (pre-image + source) --\n")
        f.write(_explain_str(chg_old))
    with open(
        os.path.join(REPO, "plans", "r19", "cdf_fused_after.txt"), "w"
    ) as f:
        f.write(
            "== r19 shape: ONE fused pass (data + change rows) ==\n"
        )
        f.write(_explain_str(fused))

    # ---- same-JVM interleaved A/B -------------------------------------
    def noop(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    olds, news = [], []
    for i in range(n_ab):
        spark.sparkContext.setJobDescription(f"old pass {i}")
        t_old = noop(chg_old) + noop(data_old)
        spark.sparkContext.setJobDescription(f"new pass {i}")
        t_new = noop(fused)
        olds.append(round(t_old, 3))
        news.append(round(t_new, 3))
        print(f"# pass {i}: old={t_old:.3f}s new={t_new:.3f}s")
    print(
        f"# min old={min(olds):.3f}s new={min(news):.3f}s "
        f"speedup={min(olds) / min(news):.2f}x"
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
