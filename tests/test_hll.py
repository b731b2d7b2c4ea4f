"""sk2_hll_sketch estimator accuracy: the oracle pins the REGISTERS
(sums of powers of two, exact in IEEE); this test derives the actual
HyperLogLog estimate from them -- harmonic mean with the standard
small/large-range corrections (Flajolet et al. 2007, public) -- and
asserts it lands within the sketch's error envelope of the exact
count, in-engine where libm ulp parity doesn't matter."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def _estimate(m: int, denom: float, n_zero: int) -> float:
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / denom
    if e <= 2.5 * m and n_zero > 0:
        return m * math.log(m / n_zero)  # linear counting
    return e


def test_hll_estimate_within_envelope(spark):
    import __spark_entry__ as ent

    rows = ent.queries()["sk2_hll_sketch"](spark, SF).collect()
    assert rows, "sketch produced no groups"
    for r in rows:
        est = _estimate(r["m"], r["harmonic_denom"], r["n_zero_registers"])
        exact = r["n_exact"]
        # 1.04/sqrt(256) ~ 6.5% std error; 3 sigma + small-n slack.
        rel = abs(est - exact) / exact
        assert rel < 0.25, (r["lang"], est, exact, rel)


def test_hll_registers_merge_by_max(spark):
    """Mergeability -- the property that makes the sketch scale: the
    register table of a union equals the element-wise max of the two
    halves' register tables."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    h = docs.selectExpr("md5(text) AS h", "doc_id")
    reg = lambda df: (  # noqa: E731
        df.selectExpr(
            "CAST(conv(substring(h, 1, 2), 16, 10) AS INT) AS bucket",
            "instr(array_join(transform(sequence(3, 17), i -> "
            "lpad(bin(conv(substring(h, i, 1), 16, 10)), 4, '0')), ''), '1') AS b1",
        )
        .selectExpr("bucket", "CASE WHEN b1 = 0 THEN 61 ELSE b1 END AS rank")
        .groupBy("bucket")
        .agg(F.max("rank").alias("m_rank"))
    )
    lo, hi = h.filter("doc_id % 2 = 0"), h.filter("doc_id % 2 = 1")
    merged = (
        reg(lo)
        .withColumnRenamed("m_rank", "a")
        .join(reg(hi).withColumnRenamed("m_rank", "b"), "bucket", "full_outer")
        .selectExpr("bucket", "greatest(coalesce(a, 0), coalesce(b, 0)) AS m_rank")
    )
    whole = reg(h)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
