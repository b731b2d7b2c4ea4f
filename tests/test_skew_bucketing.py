"""Skew/bucketing layout operators: salted-join equivalence and the
exchange-free bucketed join (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.skew import (
    salted_join,
    write_bucketed,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    fact = spark.range(0, 2000).select(
        # hot key: ~86% of rows collapse onto key 0
        F.when(F.col("id") % 7 != 0, F.lit(0)).otherwise(F.col("id") % 10).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 10).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, "k", n_salt=4).select("k", "v", "name")
    assert _rows(salted, ["k", "v", "name"]) == _rows(plain, ["k", "v", "name"])
    # left join keeps unmatched fact rows exactly like the plain left join
    fact2 = fact.withColumn("k", F.col("k") + 5)  # keys 5..14, dim has 0..9
    plain_l = fact2.join(dim, "k", "left").select("k", "v", "name")
    salted_l = salted_join(fact2, dim, "k", n_salt=4, how="left").select(
        "k", "v", "name"
    )
    assert _rows(salted_l, ["k", "v", "name"]) == _rows(plain_l, ["k", "v", "name"])


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("custkey"), (F.col("id") % 97).alias("total")
    )
    cust = spark.range(0, 300).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    write_bucketed(orders, "b_orders", "custkey", 8, str(tmp_path / "b_orders"))
    write_bucketed(cust, "b_cust", "custkey", 8, str(tmp_path / "b_cust"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_cust"), "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Both sides share the bucket layout on the join key: the join
        # runs in place, no shuffle on either side.
        assert "Exchange" not in plan, plan
        assert joined.count() == 300
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")
