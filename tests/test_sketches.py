"""sk3_countmin_heavy_hitters invariants: the oracle pins the counter
grid and the estimates bit-for-bit; these tests assert the PROPERTIES
that make the sketch a sketch -- the one-sided error bound
(est >= true, Cormode & Muthukrishnan 2005, public), the epsilon*N
overestimate envelope, and mergeability of the counter grid (partial
grids from disjoint splits sum to the whole-stream grid, which is what
lets a 1000-executor run build it with one partial+final agg)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def test_countmin_one_sided_and_bounded(spark):
    import __spark_entry__ as ent
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_profile as qp,
    )

    rows = ent.queries()["sk3_countmin_heavy_hitters"](spark, SF).collect()
    assert len(rows) == 10
    n_events = (
        spark.read.parquet(f"{SF}/events.parquet").count()
    )
    # Standard CM bound: overestimate <= e/W * N with prob 1-exp(-D).
    # W=256 -> eps*N ~ 1% of the stream; use 2x slack for the md5
    # "hash family" not being perfectly pairwise-independent.
    cap = 2.0 * 2.718281828 / qp._CM_W * n_events
    for r in rows:
        assert r["est_n"] >= r["true_n"], r  # never undercounts
        assert r["est_n"] - r["true_n"] <= cap, (r, cap)


def test_countmin_counters_merge_by_sum(spark):
    """Build the grid on two disjoint halves of the stream and assert
    cell-wise sums equal the whole-stream grid -- the merge law the
    distributed partial+final aggregation relies on."""
    from pyspark.sql import functions as F

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_profile as qp,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    )

    def grid(df):
        return (
            df.selectExpr(
                "user_id",
                f"explode(sequence(0, {qp._CM_D - 1})) AS j",
            )
            .selectExpr(
                "j",
                "CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', "
                "CAST(user_id AS STRING))), 1, 2), 16, 10) AS INT) AS bucket",
            )
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    whole = {(r["j"], r["bucket"]): r["c"] for r in grid(ev).collect()}
    lo = grid(ev.filter(F.col("event_id") % 2 == 0)).collect()
    hi = grid(ev.filter(F.col("event_id") % 2 == 1)).collect()
    merged: dict[tuple, int] = {}
    for r in [*lo, *hi]:
        k = (r["j"], r["bucket"])
        merged[k] = merged.get(k, 0) + r["c"]
    assert merged == whole


def test_bloom_no_false_negatives_and_fp_envelope(spark):
    import __spark_entry__ as ent
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_profile as qp,
    )

    rows = ent.queries()["sk4_bloom_membership"](spark, SF).collect()
    cells = {(r["bloom_positive"], r["is_member"]): r["n_probes"] for r in rows}
    # A (False, True) cell would be a false negative -- structurally
    # impossible for a Bloom filter; its absence is the core invariant.
    assert (False, True) not in cells
    n_members_probed = cells.get((True, True), 0)
    assert n_members_probed > 0
    fp = cells.get((True, False), 0)
    tn = cells.get((False, False), 0)
    n_set = rows[0]["n_set_bits"]
    # FP prob for a probe = (fraction of set bits)^K; 3x envelope.
    p_fp = (n_set / qp._BF_M) ** qp._BF_K
    assert fp <= max(10, 3 * p_fp * (fp + tn)), (fp, tn, p_fp)


def test_bloom_bits_merge_by_union(spark):
    """Merge law: the filter of a union is the bitwise OR (= distinct
    union of set positions) of per-split filters -- what makes the
    build a partial+final distinct at any scale."""
    from pyspark.sql import functions as F

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans import (
        queries_profile as qp,
    )

    members = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
    )
    bit_expr = (
        "CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', "
        f"CAST(user_id AS STRING))), 1, 3), 16, 10) % {qp._BF_M} AS INT) AS bit"
    )

    def bits(df):
        return {
            r["bit"]
            for r in df.selectExpr(
                "user_id", f"explode(sequence(0, {qp._BF_K - 1})) AS j"
            )
            .selectExpr(bit_expr)
            .distinct()
            .collect()
        }

    whole = bits(members)
    lo = bits(members.filter(F.col("user_id") % 2 == 0))
    hi = bits(members.filter(F.col("user_id") % 2 == 1))
    assert lo | hi == whole
