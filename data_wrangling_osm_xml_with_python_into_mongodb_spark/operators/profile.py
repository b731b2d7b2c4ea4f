"""Structure profiling: the reference's osm_structure_audit.py:20-83
as two grouped aggregations over the raw element frame.

The reference hand-rolls hash aggregation in pandas Series with
unbounded value sets (its author flags the memory hazard at
osm_structure_audit.py:15-18).  The Spark form:

* element profile: count + attribute/subelement presence per kind;
* tag profile: per-key use count, EXACT distinct-value count (cheap
  via partial aggregation), and a min-by-fingerprint value sample --
  the ``cap`` distinct values with the smallest md5 digest, i.e. a
  deterministic uniform sample whose selection is rank-based, so NO
  aggregation buffer ever holds more than ``cap`` values per key.
  (An earlier version collected the full distinct set and sliced the
  OUTPUT -- exactly the unbounded buffer the reference's author
  warns about; at millions of distinct ``name`` values that is the
  memory cliff.)  The rank filter runs as a sort-based window, which
  spills instead of buffering, and the sample is md5-keyed so an
  engine-independent oracle (DuckDB computes identical md5 hex) can
  reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    ``usage_per_uniq`` from :79-81).

    ``val_sample`` is the ``value_sample_cap`` distinct values with
    the smallest md5 digest, shown sorted: a deterministic uniform
    sample selected by RANK, not by collecting the full distinct set
    -- per-key memory is bounded at ``cap`` regardless of
    cardinality.  Plan shape: one shuffle for the counting agg, one
    distinct + windowed rank for the sample (sort-based, spills), one
    broadcast-or-shuffle join keyed the same way."""
    kv = raw.select(F.explode("tags").alias("t")).select(
        F.col("t.k").alias("k"), F.col("t.v").alias("v")
    )
    counts = kv.groupBy("k").agg(
        F.count(F.lit(1)).alias("tag_use_count"),
        F.countDistinct("v").alias("uniq_count"),
    )
    # Tiebreak on v itself: md5 collisions don't break determinism.
    # Null values are excluded BEFORE ranking: Spark orders NULLS
    # FIRST where DuckDB orders them last, and collect_list would
    # silently drop the null after it consumed a rank slot -- the
    # sample is defined over real values only.
    rank = Window.partitionBy("k").orderBy(F.md5("v"), F.col("v"))
    sample = (
        kv.filter(F.col("v").isNotNull())
        .distinct()
        .withColumn("_rn", F.row_number().over(rank))
        .filter(F.col("_rn") <= value_sample_cap)
        .groupBy("k")
        .agg(F.sort_array(F.collect_list("v")).alias("val_sample"))
    )
    # A key whose values are ALL null has no sample rows (the join
    # misses) and uniq_count = 0: coalesce to an empty array and null
    # the ratio explicitly -- Spark would render NULL/"" where DuckDB
    # renders NULL/error, so both engines must agree by construction.
    return (
        counts.join(sample, "k", "left")
        .withColumn(
            "val_sample",
            F.coalesce(F.col("val_sample"), F.array().cast("array<string>")),
        )
        .withColumn(
            "usage_per_uniq",
            F.when(
                F.col("uniq_count") > 0,
                F.round(F.col("tag_use_count") / F.col("uniq_count"), 2),
            ),
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
