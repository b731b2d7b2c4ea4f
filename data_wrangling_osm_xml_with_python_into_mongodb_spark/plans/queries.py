"""The registered query surface: every operator class from the reference
(SURVEY.md §2) expressed as a Spark DataFrame plan over the synthetic
benchmark tables, each paired with an ANSI-SQL oracle that DuckDB runs
on the same parquet files.

Conventions that make the driver's order-insensitive value-hash match:

* every computed column is aliased identically in Spark and SQL;
* double-typed aggregates are ``round(x, 2)`` on both sides (kills
  last-ulp differences from summation order);
* array-valued aggregates are sorted (``sort_array`` / ``list_sort``)
  because row hashing is order-insensitive but arrays are values;
* top-k queries order by a unique tiebreak key so the returned SET of
  rows is deterministic.

Scale notes are given per query: which side broadcasts, where the
shuffle lands, and why the plan survives a 100x scale-up.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


@dataclass(frozen=True)
class QueryDef:
    name: str
    doc: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str, doc: str, oracle: str | None, tags: tuple[str, ...] = ()
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        REGISTRY[name] = QueryDef(name=name, doc=doc, spark=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a too-few-splits scan before CPU-heavy per-row work.

    Small-SF tables arrive as one parquet file -> one input split,
    which serializes expression-heavy pipelines (shingling, hashing,
    vector math) on a single core.  At real scale the scan has
    thousands of splits and this is a no-op -- the round-robin shuffle
    only fires when the scan yields fewer partitions than the cluster
    has task slots; locally it spreads the work across every core for
    the cost of shuffling the tiny input once.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Cheap first pass: inputFiles() is metadata-only.  Only when the
    # FILE count looks low do we pay the RDD conversion to ask for the
    # real split count -- a single multi-GB parquet file still splits
    # into many size-based partitions, and repartitioning it here would
    # force a pointless full shuffle.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = target
    if 0 < n_files < max(2, target // 2):
        if df.rdd.getNumPartitions() < max(2, target // 2):
            return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1 style grouped aggregation (reference A3/A4/A8 class:
# mongo_audit.py:46-62 group-count generalized to multi-aggregate).
# Scale: partial+final hash agg, map-side combine reduces the shuffle to
# |groups| x |partitions| rows; AQE coalesces post-shuffle partitions.
# ---------------------------------------------------------------------------
@register(
    "tpch_q1_pricing_summary",
    "Grouped multi-aggregate pricing summary (flagship; reference group-count "
    "operator A3/A4 generalized, mongo_audit.py:46-81).",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                       AS avg_qty,
           round(avg(l_extendedprice), 2)                                  AS avg_price,
           round(avg(l_discount), 2)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A1: distinct-count (mongo_audit.py:7-12 $group uid -> $count).
# Scale: countDistinct = two-phase partial agg; swap to
# approx_count_distinct for sketch-sized shuffle at 100 TB.
# ---------------------------------------------------------------------------
@register(
    "a1_unique_users",
    "Distinct-count of ordering customers (reference A1 unique-users, "
    "mongo_audit.py:7-12).",
    "SELECT count(DISTINCT o_custkey) AS unique_users FROM orders",
    tags=("agg",),
)
def q_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("unique_users")
    )


# ---------------------------------------------------------------------------
# A3: group-by count with pre-filter (mongo_audit.py:46-62).
# ---------------------------------------------------------------------------
@register(
    "a3_orders_by_status",
    "Filtered group-by count (reference A3 count_docs_by, mongo_audit.py:46-62).",
    """
    SELECT o_orderstatus, count(*) AS n_orders
    FROM orders
    WHERE o_custkey IS NOT NULL
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def q_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# A4: the reference loops per doc_type and unions counts
# (mongo_audit.py:65-81); one grouped agg on the pair replaces the loop.
# ---------------------------------------------------------------------------
@register(
    "a4_counts_by_flag_status",
    "Two-key grouped count replacing the reference's per-type loop "
    "(A4 check_doc_counts_by, mongo_audit.py:65-81).",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def q_counts_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# A5: $addToSet set-aggregation (mongo_audit.py:139-140). Arrays sorted so
# the value-hash is deterministic.
# ---------------------------------------------------------------------------
@register(
    "a5_segments_per_nation",
    "Set-aggregate of market segments per nation (reference A5 $addToSet, "
    "mongo_audit.py:139-140).",
    """
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
           count(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg", "nested"),
)
def q_segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The set is serialized '|'-joined (not returned as array<string>):
    # the correctness driver canonicalizes results through pandas, which
    # cannot hash list cells.  Deterministic because the array is sorted.
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.concat_ws(
                "|", F.sort_array(F.collect_set("c_mktsegment"))
            ).alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# M3 + A6: the inverted reference index -- the reference's ref_docs
# materialized view (mongo_audit.py:271-329): explode refs, group by
# referenced id, $push referencing ids.  Here: which orders reference
# each part.  Scale: single hash-partition shuffle on the group key;
# collect_list is bounded by per-key fanout (salting if a key is hot).
# ---------------------------------------------------------------------------
@register(
    "m3_ref_index_parts",
    "Inverted reference index: per part, the sorted list of referencing "
    "orders (reference M3 write_ref_docs, mongo_audit.py:271-329).",
    """
    SELECT l_partkey AS ref_id,
           array_to_string(list_sort(list(l_orderkey))[1:100], '|') AS refers,
           count(*) AS refer_count
    FROM lineitem
    GROUP BY l_partkey
    """,
    tags=("agg", "nested", "mview"),
)
def q_ref_index_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # refers serialized '|'-joined (sorted, so deterministic): the
    # correctness driver's pandas canonicalizer cannot hash list cells.
    # The serialized posting list is CAPPED at the first 100 ids (the
    # full cardinality stays in refer_count): an unbounded list for a
    # hot referenced id would build a multi-MB string inside one
    # aggregation buffer at corpus scale.  Real ref-doc
    # materializations truncate or page posting lists the same way.
    # Buffer note: per-key fanout here is the lineitems-per-part ratio
    # (~30 at every SF), so the pre-slice buffer is bounded by data
    # shape; the rank-window form that also bounds the buffer (used by
    # build_ref_docs(cap=...) where fanout is open-ended) measured
    # 4.7x slower steady-state at sf0.1 (0.80s vs 0.17s -- window
    # sort forfeits map-side partial aggregation) and was rejected.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("ref_id"))
        .agg(
            F.concat_ws(
                "|",
                F.slice(F.sort_array(F.collect_list("l_orderkey")), 1, 100),
            ).alias("refers"),
            F.count(F.lit(1)).alias("refer_count"),
        )
    )


# ---------------------------------------------------------------------------
# J1: $lookup left outer join preserving misses (mongo_audit.py:109-124):
# parts with no lineitem keep count 0.
# Scale: lineitem pre-aggregated BEFORE the join (shuffle carries
# |parts| rows, not |lineitem|); part side joined broadcast when small.
# ---------------------------------------------------------------------------
@register(
    "j1_left_join_part_sales",
    "Left outer join keeping unmatched rows (reference J1 $lookup, "
    "mongo_audit.py:109-124): per-brand lineitem counts incl. unsold parts.",
    """
    SELECT p.p_brand, count(l.l_orderkey) AS n_lineitems,
           count(*) AS n_rows
    FROM part p
    LEFT JOIN (SELECT l_partkey, l_orderkey FROM lineitem) l
      ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
    tags=("join",),
)
def q_left_join_part_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_orderkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.count("l_orderkey").alias("n_lineitems"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# J2: $lookup + $unwind == inner join (mongo_audit.py:166-175 comment).
# Revenue per market segment through a 3-table chain.
# Scale: customer/orders are the small sides -- Catalyst broadcasts them
# under the threshold; at 100 TB the lineitem-orders join shuffles on
# orderkey (both sides co-partitionable; bucketing candidate).
# ---------------------------------------------------------------------------
@register(
    "j2_inner_join_revenue",
    "Inner-join chain lineitem-orders-customer with revenue rollup "
    "(reference J2 $lookup+$unwind, mongo_audit.py:163-226).",
    """
    SELECT c.c_mktsegment,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join",),
)
def q_inner_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J3: $lookup + $match refs != [] == left SEMI join (mongo_audit.py:109-144).
# Scale: left_semi avoids materializing match payloads entirely.
# ---------------------------------------------------------------------------
@register(
    "j3_semi_join_heavy_orders",
    "Left semi join: orders having at least one heavy lineitem "
    "(reference J3 $lookup + $ne [] existence idiom, mongo_audit.py:109-144).",
    """
    SELECT o.o_orderstatus, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0
    )
    GROUP BY o.o_orderstatus
    """,
    tags=("join",),
)
def q_semi_join_heavy_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    heavy = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45.0)
        .select("l_orderkey")
    )
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# J4 + O1: chained lookups against the materialized index then top-k
# (mongo_audit.py:341-381 get_most_refd): most-referenced parts with
# their descriptions.  Scale: pre-agg shrinks to |parts| rows; the
# dimension join broadcasts; TakeOrderedAndProject avoids a global sort.
# ---------------------------------------------------------------------------
@register(
    "j4_most_referenced_parts",
    "Top-k most-referenced parts with dimension payload (reference J4+O1 "
    "get_most_refd, mongo_audit.py:341-381).",
    """
    SELECT p.p_partkey, p.p_name, r.refer_count
    FROM (
      SELECT l_partkey, count(*) AS refer_count
      FROM lineitem GROUP BY l_partkey
    ) r
    JOIN part p ON r.l_partkey = p.p_partkey
    ORDER BY r.refer_count DESC, p.p_partkey ASC
    LIMIT 5
    """,
    tags=("join", "topk"),
)
def q_most_referenced_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    refs = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("refer_count"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        refs.join(F.broadcast(part), refs.l_partkey == part.p_partkey)
        .select("p_partkey", "p_name", "refer_count")
        .orderBy(F.desc("refer_count"), F.asc("p_partkey"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# O1: global top-k (mongo_audit.py:361-362 $sort+$limit).  Spark plans
# TakeOrderedAndProject: per-partition heaps, no full sort.
# ---------------------------------------------------------------------------
@register(
    "o1_topk_orders",
    "Global top-k by value with unique tiebreak (reference O1 $sort desc + "
    "$limit, mongo_audit.py:361-362).",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 5
    """,
    tags=("topk",),
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(5)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# U2: union of two ref streams then re-group (mongo_audit.py:306-311
# refs: [node_refs, members.ref] -> $unwind).
# ---------------------------------------------------------------------------
@register(
    "u2_union_nation_presence",
    "Union of two entity streams grouped on the merged key (reference U2, "
    "mongo_audit.py:306-311).",
    """
    SELECT nationkey, count(*) AS n_entities
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
    tags=("setop",),
)
def q_union_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        cust.unionByName(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_entities"))
    )


# ---------------------------------------------------------------------------
# P5: $or disjunctive predicate (mongo_audit.py:87-89) + projection P6.
# ---------------------------------------------------------------------------
@register(
    "p5_or_filter_orders",
    "Disjunctive predicate + projection (reference P5 $or bike-services "
    "query, mongo_audit.py:84-94).",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderstatus = 'F' OR o_totalprice > 200000.0
       OR o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
    tags=("filter",),
)
def q_or_filter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            | (F.col("o_totalprice") > 200000.0)
            | (F.col("o_orderpriority") == "1-URGENT")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# P8 + P9: $cmp 3-way compare projected, then $cond conditional rewrite
# (mongo_audit.py:177-226 doctype-mismatch audit).
# ---------------------------------------------------------------------------
@register(
    "p8_cmp_cond_audit",
    "3-way compare + conditional projection (reference P8 $cmp / P9 $cond, "
    "mongo_audit.py:177-226).",
    """
    SELECT comp, count(*) AS n_items
    FROM (
      SELECT CASE WHEN l_returnflag < l_linestatus THEN -1
                  WHEN l_returnflag = l_linestatus THEN 0
                  ELSE 1 END AS comp
      FROM lineitem
    )
    GROUP BY comp
    """,
    tags=("filter",),
)
def q_cmp_cond_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    comp = (
        F.when(F.col("l_returnflag") < F.col("l_linestatus"), F.lit(-1))
        .when(F.col("l_returnflag") == F.col("l_linestatus"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("comp")
    )
    return li.select(comp).groupBy("comp").agg(F.count(F.lit(1)).alias("n_items"))
