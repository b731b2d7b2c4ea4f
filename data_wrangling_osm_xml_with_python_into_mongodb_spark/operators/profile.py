"""Structure profiling: the reference's osm_structure_audit.py:20-83
as two grouped aggregations over the raw element frame.

The reference hand-rolls hash aggregation in pandas Series with
unbounded value sets (its author flags the memory hazard at
osm_structure_audit.py:15-18).  The Spark form is two shuffles:

* element profile: count + attribute/subelement presence per kind;
* tag profile: per-key use count, distinct-value count, and a CAPPED
  sample of values (``slice(sort_array(collect_set), 1, cap)``) --
  the bounded stand-in for the reference's full val_set, safe at any
  scale; exact distinct counts stay cheap via partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_elements(raw: DataFrame) -> DataFrame:
    """Per element kind: count and subelement totals
    (reference osm_structure_audit.py:52-63)."""
    return (
        raw.groupBy("doc_type")
        .agg(
            F.count(F.lit(1)).alias("n_elements"),
            F.sum(F.coalesce(F.size("tags"), F.lit(0))).alias("n_tags"),
            F.sum(F.coalesce(F.size("nds"), F.lit(0))).alias("n_nds"),
            F.sum(F.coalesce(F.size("members"), F.lit(0))).alias("n_members"),
        )
        .orderBy("doc_type")
    )


def profile_tags(raw: DataFrame, value_sample_cap: int = 20) -> DataFrame:
    """Per tag key: use count, distinct values, usage ratio, sampled
    values (reference osm_structure_audit.py:65-82; the ratio column is
    ``usage_per_uniq`` from :79-81)."""
    kv = raw.select(F.explode("tags").alias("t")).select(
        F.col("t.k").alias("k"), F.col("t.v").alias("v")
    )
    return (
        kv.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("tag_use_count"),
            F.countDistinct("v").alias("uniq_count"),
            F.slice(
                F.sort_array(F.collect_set("v")), 1, value_sample_cap
            ).alias("val_sample"),
        )
        .withColumn(
            "usage_per_uniq",
            F.round(F.col("tag_use_count") / F.col("uniq_count"), 2),
        )
    )


def summary_stats(tag_profile: DataFrame) -> DataFrame:
    """Decile summary of the tag profile (reference main.ipynb cell 8
    ``describe(percentiles=np.arange(.1, 1, .1))``)."""
    percentiles = [i / 10 for i in range(1, 10)]
    return tag_profile.select(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.avg("tag_use_count"), 2).alias("mean_use"),
        F.round(F.stddev("tag_use_count"), 2).alias("std_use"),
        F.min("tag_use_count").alias("min_use"),
        F.max("tag_use_count").alias("max_use"),
        *[
            F.expr(f"percentile(tag_use_count, {p})").alias(f"p{int(p * 100)}_use")
            for p in percentiles
        ],
    )
