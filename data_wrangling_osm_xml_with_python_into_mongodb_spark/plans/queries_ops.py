"""Remaining reference operator classes as first-class oracle-gated
queries (SURVEY.md §2 line-item coverage): filtered/existence counts,
list-aggregation, count reconciliation, before/after update reports,
projection-with-rename, $ne filters, conditional projection, literal
map-lookup joins, and set-dedup -- each on the synthetic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, register


@register(
    "a2_exists_filtered_count",
    "Filtered count gated on JSON field existence (reference A2 filtered "
    "count, mongo_audit.py:15-19, + P4 $exists predicate, "
    "mongo_audit.py:16-18; Mongo dot-path existence maps to JSON-path / "
    "nested-column isNotNull).",
    """
    SELECT count(*) AS n_events
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
    tags=("filter", "json"),
)
def q_exists_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.filter(k.isNotNull() & (k.cast("long") >= 50)).agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "a6_push_list_agg",
    "List-aggregation of order priorities per customer (reference A6 "
    "$push, mongo_audit.py:314-322; sorted for deterministic compare -- "
    "reference O2 client-side sort, clean_and_write.py:347).",
    """
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderpriority)), '|') AS priorities,
           count(*) AS n_orders
    FROM orders
    WHERE o_custkey < 100
    GROUP BY o_custkey
    """,
    tags=("agg", "nested"),
)
def q_push_list_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # priorities serialized '|'-joined (sorted, so deterministic): the
    # correctness driver's pandas canonicalizer cannot hash list cells.
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    return orders.groupBy("o_custkey").agg(
        F.concat_ws(
            "|", F.sort_array(F.collect_list("o_orderpriority"))
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "a9_count_reconciliation",
    "Count reconciliation across two derivations of the same total "
    "(reference A9, main.ipynb cell 36: XML element counts == loaded doc "
    "counts): full-table count vs sum of per-group counts.",
    """
    SELECT total.n AS n_total, by_status.n AS n_by_status,
           total.n = by_status.n AS counts_match
    FROM (SELECT count(*) AS n FROM orders) total,
         (SELECT CAST(sum(n) AS BIGINT) AS n
          FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderstatus)) by_status
    """,
    tags=("agg", "audit"),
)
def q_count_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    total = orders.agg(F.count(F.lit(1)).alias("n"))
    by_status = (
        orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum("n").alias("n"))
    )
    return total.crossJoin(by_status.withColumnRenamed("n", "n2")).select(
        F.col("n").alias("n_total"),
        F.col("n2").alias("n_by_status"),
        (F.col("n") == F.col("n2")).alias("counts_match"),
    )


@register(
    "a10_before_after_report",
    "Pre/Matched/Modified/Post report matrix around a conditional update "
    "(reference A10 update_states report, mongo_audit.py:22-43).",
    """
    SELECT 'pre' AS phase,
           count(*) AS n_urgent,
           CAST(NULL AS BIGINT) AS n_matched, CAST(NULL AS BIGINT) AS n_modified
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'post' AS phase,
           count(CASE WHEN o_totalprice > 300000.0
                        OR o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
           count(CASE WHEN o_totalprice > 300000.0 THEN 1 END) AS n_matched,
           count(CASE WHEN o_totalprice > 300000.0
                       AND o_orderpriority <> '1-URGENT' THEN 1 END) AS n_modified
    FROM orders
    """,
    tags=("agg", "update", "audit"),
)
def q_before_after_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    matched = F.col("o_totalprice") > 300000.0
    pre = orders.filter(urgent).agg(
        F.lit("pre").alias("phase"),
        F.count(F.lit(1)).alias("n_urgent"),
        F.lit(None).cast("long").alias("n_matched"),
        F.lit(None).cast("long").alias("n_modified"),
    )
    post = orders.agg(
        F.lit("post").alias("phase"),
        F.count(F.when(matched | urgent, 1)).alias("n_urgent"),
        F.count(F.when(matched, 1)).alias("n_matched"),
        F.count(F.when(matched & ~urgent, 1)).alias("n_modified"),
    )
    return pre.unionByName(post)


@register(
    "p6_projection_rename",
    "Field projection with rename and computed column (reference P6 "
    "$project incl. rename, mongo_audit.py:90-92,177-183).",
    """
    SELECT o_orderkey AS order_id,
           o_orderpriority AS priority,
           o_totalprice * 0.5 AS half_price
    FROM orders
    WHERE o_orderkey < 500
    """,
    tags=("projection",),
)
def q_projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderpriority").alias("priority"),
            (F.col("o_totalprice") * 0.5).alias("half_price"),
        )
    )


@register(
    "p7_ne_filter",
    "$ne inequality filter + grouped count (reference P7, "
    "mongo_audit.py:120,138,184).",
    """
    SELECT event_type, count(*) AS n
    FROM events
    WHERE event_type <> 'click'
    GROUP BY event_type
    """,
    tags=("filter",),
)
def q_ne_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") != "click")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "p9_cond_projection",
    "Conditional projection rebuilding a value by predicate (reference P9 "
    "$cond, mongo_audit.py:209-220, and P8 $cmp 3-way compare, "
    "mongo_audit.py:180,208).",
    """
    SELECT CASE WHEN o_totalprice > 250000.0 THEN 'high'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'low' END AS bucket,
           CASE WHEN o_totalprice > 150000.0 THEN 1
                WHEN o_totalprice = 150000.0 THEN 0
                ELSE -1 END AS cmp_150k,
           count(*) AS n
    FROM orders
    GROUP BY bucket, cmp_150k
    """,
    tags=("projection", "filter"),
)
def q_cond_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    price = F.col("o_totalprice")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            F.when(price > 250000.0, "high")
            .when(price > 100000.0, "mid")
            .otherwise("low")
            .alias("bucket"),
            F.when(price > 150000.0, 1)
            .when(price == 150000.0, 0)
            .otherwise(-1)
            .alias("cmp_150k"),
        )
        .groupBy("bucket", "cmp_150k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Literal mapping table (reference J5 dict-lookup joins during cleaning:
# STREET_TYPE_MAP / WRONG_KEY_MAP, clean_and_write.py:22-28,34-39).
_REGION_CODE = {
    "AFRICA": "af",
    "AMERICA": "am",
    "ASIA": "as",
    "EUROPE": "eu",
    "MIDDLE EAST": "me",
}


@register(
    "j5_literal_map_join",
    "Dimension mapping via a literal map lookup -- the Spark shape of the "
    "reference's cleaning-dict joins (J5, clean_and_write.py:22-45,73-75): "
    "create_map literal applied per row, no shuffle (vs a broadcast join "
    "for larger dims).",
    f"""
    SELECT n_name, r_name,
           CASE r_name {" ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _REGION_CODE.items())}
                ELSE NULL END AS region_code
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("join", "cleaning"),
)
def q_literal_map_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    code_map = F.create_map(
        *[F.lit(x) for kv in _REGION_CODE.items() for x in kv]
    )
    return (
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select("n_name", "r_name", code_map[F.col("r_name")].alias("region_code"))
    )


@register(
    "u1_set_dedup_agg",
    "Set-dedup aggregation: sorted distinct event types per user "
    "(reference U1 set-dedup, clean_and_write.py:258,271-272,346-347, in "
    "aggregated form).",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|') AS event_types,
           CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_distinct
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    """,
    tags=("agg", "dedup"),
)
def q_set_dedup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single collect_set, reused for both the serialized list and its
    # size; '|'-joined (sorted, so deterministic) because the driver's
    # pandas canonicalizer cannot hash list cells.
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    types = F.sort_array(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.concat_ws("|", types).alias("event_types"),
        F.size(types).alias("n_distinct"),
    )


_SQL1 = """
    SELECT o.o_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
"""


@register(
    "sql1_shipping_priority",
    "The spark.sql(...) surface: TPC-H Q3-style shipping-priority query "
    "run as LITERAL SQL over registered temp views -- the same string "
    "(modulo nothing) is the DuckDB oracle, demonstrating that the "
    "engine's SQL entry point matches its DataFrame entry point.",
    _SQL1,
    tags=("sql", "join", "topk"),
)
def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Register the needed tables as temp views, then execute the SAME
    # SQL string the oracle runs.  Catalyst plans it like any DataFrame
    # chain: pushed filters on both scan sides, broadcast of the small
    # dimension, partial/final aggregation, TakeOrderedAndProject.
    for name in ("customer", "orders", "lineitem"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL1)


@register(
    "j6_salted_skew_join",
    "Skew-resistant salted join: a manufactured hot key (most events "
    "collapse to key 0) joined to a small dimension through "
    "operators/skew.salted_join -- results identical to the plain join "
    "(the oracle IS the plain join); only the partitioning changes, "
    "spreading the hot key across n_salt tasks.",
    """
    SELECT d.k AS k, d.region_name,
           count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM (SELECT CASE WHEN user_id % 7 <> 0 THEN 0 ELSE user_id END AS k,
                 value
          FROM events) e
    JOIN (SELECT n_nationkey AS k, n_name AS region_name FROM nation) d
      ON e.k = d.k
    GROUP BY d.k, d.region_name
    """,
    tags=("join", "skew"),
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 7 != 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("k"),
        "value",
    )
    dim = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"),
        F.col("n_name").alias("region_name"),
    )
    return (
        salted_join(ev, dim, "k", n_salt=8)
        .groupBy("k", "region_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "u4_intersect_except",
    "Set operations beyond union (SURVEY §2.6): customers ordering in "
    "BOTH halves of the date range (INTERSECT) and only in the first "
    "half (EXCEPT), as one labeled union of the two set results.",
    """
    WITH h1 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
    h2 AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    SELECT 'both' AS cohort, o_custkey FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
    UNION ALL
    SELECT 'first_only' AS cohort, o_custkey FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
    """,
    tags=("setop",),
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cut = "1998-01-01 00:00:00"
    h1 = orders.filter(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    h2 = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    both = h1.intersect(h2).select(F.lit("both").alias("cohort"), "o_custkey")
    first_only = h1.exceptAll(h2).select(
        F.lit("first_only").alias("cohort"), "o_custkey"
    )
    return both.unionByName(first_only)


_RJ_BANDS = 12
_RJ_BUCKETS = 256


@register(
    "rj1_range_join_buckets",
    "Range (interval) join -- the non-equi join Spark has no native "
    "operator for: every event joined to the variable-width value band "
    "containing it.  Spark side implements the production technique "
    "(band intervals exploded onto a fixed bucket grid, broadcast "
    "equi-join on bucket, residual BETWEEN filter); the oracle is the "
    "plain non-equi join, so the bucketing must be exactly lossless.",
    f"""
    WITH ranked AS (
      SELECT value,
             ntile({_RJ_BANDS}) OVER (ORDER BY value, event_id) AS band
      FROM events
    ),
    bands AS (
      SELECT band, min(value) AS lo, max(value) AS hi
      FROM ranked GROUP BY band
    )
    SELECT b.band,
           round(b.lo, 4) AS lo,
           round(b.hi, 4) AS hi,
           count(*) AS n,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN bands b ON e.value BETWEEN b.lo AND b.hi
    GROUP BY b.band, b.lo, b.hi
    """,
    tags=("join", "range"),
)
def q_range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A naive range join is a cartesian product with a filter --
    O(rows x bands) compares and a single-task BroadcastNestedLoopJoin
    at scale.  The bucket-grid rewrite makes it an EQUI-join: chop the
    value domain into 256 fixed buckets, explode each band
    onto the buckets its [lo, hi] overlaps (monotone floor arithmetic,
    so membership is exactly preserved), broadcast that small exploded
    dim, hash-join on bucket, and keep the BETWEEN as a residual
    filter.  Each probe row meets only the bands sharing its bucket
    (~1), not all of them.  The rewrite lives in operators/ranges.py
    (shared with rj2).  THIS query's band dim build uses ntile (a
    global sort) because equi-depth edges are what the oracle can pin
    exactly -- fine for a dim-sized build; rj2 is the sort-free band
    build (aggregate-derived edges), and tests/test_ranges.py covers
    approx_percentile edges, which change only the edge VALUES, never
    the join plan."""
    from pyspark.sql import Window

    from ..operators.ranges import range_join

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    bands = (
        ev.select(
            "value",
            F.ntile(_RJ_BANDS)
            .over(Window.orderBy("value", "event_id"))
            .alias("band"),
        )
        .groupBy("band")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    return (
        range_join(ev.select("value"), bands, "value", n_buckets=_RJ_BUCKETS)
        .groupBy("band", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(18,2) sum: exact for 2-decimal inputs, so both
            # engines cast the identical quantity to the identical double
            # (double partials are NOT addition-order-safe).
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "band",
            F.round("lo", 4).alias("lo"),
            F.round("hi", 4).alias("hi"),
            "n",
            "sum_value",
        )
    )


@register(
    "rj2_range_join_agg_bands",
    "The range join at non-dim band cardinality discipline: band edges "
    "derived by plain AGGREGATION (per-brand min/max retail price -- "
    "overlapping intervals), so the whole query contains NO global "
    "sort, no window, no ntile; every part is joined to every brand "
    "whose price range contains its price through the same bucket-grid "
    "equi-join rewrite as rj1 (operators/ranges.py).  Exact-aggregate "
    "edges keep the oracle exact where approx_percentile edges could "
    "not be cross-engine-pinned (tests/test_ranges.py proves that path "
    "against Spark's own naive non-equi join instead).",
    """
    WITH bands AS (
      SELECT p_brand, min(p_retailprice) AS lo, max(p_retailprice) AS hi
      FROM part GROUP BY p_brand
    )
    SELECT b.p_brand AS brand,
           round(b.lo, 2) AS lo,
           round(b.hi, 2) AS hi,
           count(*) AS n,
           CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM part p JOIN bands b ON p.p_retailprice BETWEEN b.lo AND b.hi
    GROUP BY b.p_brand, b.lo, b.hi
    """,
    tags=("join", "range"),
)
def q_range_join_agg_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: two exact aggregates (band dim + grid stats, both
    AQE-splittable partial+final hash aggs), broadcast equi-join on
    bucket, residual BETWEEN, final partial+final agg -- zero sorts
    anywhere.  This is the 100 TB form rj1's docstring promises: when
    the band source is no longer dim-buildable by ntile, derive edges
    by aggregation (or approx_percentile for equi-depth) and reuse the
    identical join plan."""
    from ..operators.ranges import range_join

    part = _t(spark, sf_dir, "part").select("p_brand", "p_retailprice")
    bands = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.min("p_retailprice").alias("lo"),
        F.max("p_retailprice").alias("hi"),
    )
    return (
        range_join(
            part.select("p_retailprice"), bands, "p_retailprice",
            n_buckets=_RJ_BUCKETS,
        )
        .groupBy("brand", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            "brand",
            F.round("lo", 2).alias("lo"),
            F.round("hi", 2).alias("hi"),
            "n",
            "sum_price",
        )
    )


_SQL2 = """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
"""


@register(
    "sql2_local_supplier_volume",
    "TPC-H Q5-style local-supplier-volume: a 6-table join (two fact "
    "tables, four dims) as LITERAL SQL over temp views, same string as "
    "the DuckDB oracle.  The interesting part is what Catalyst does "
    "unprompted: region/nation/supplier broadcast, the region filter "
    "transitively prunes nation before the fact joins, and the date "
    "range pushes into the orders scan.",
    _SQL2,
    tags=("sql", "join", "agg"),
)
def q_sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No hints on purpose: the plan must come out right from the
    declarative form alone (BroadcastHashJoins for every dim side,
    PushedFilters on o_orderdate) -- the 100 TB posture is identical,
    with AQE choosing shuffle-hash vs broadcast by runtime stats."""
    for name in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL2)


@register(
    "a11_rollup_matrix",
    "Multi-level aggregation in one pass: ROLLUP over (returnflag, "
    "linestatus) produces the detail rows, per-flag subtotals and the "
    "grand total together with a grouping_id discriminator -- the "
    "operator class behind every drill-down report matrix.",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                AS INTEGER) AS gid,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def q_rollup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native rollup: Spark expands the grouping sets inside ONE
    partial+final hash aggregate (an Expand node feeding the agg), so
    all three levels cost a single scan + single shuffle -- not three
    separate group-bys unioned.  grouping() disambiguates real NULL
    keys from subtotal rows; both engines define it identically."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("int")
            .alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
            "gid",
            "n",
            "total_price",
        )
    )


_PIVOT_TYPES = ("click", "purchase", "signup", "view", "error")


@register(
    "p11_pivot_event_matrix",
    "Pivot: per-user event counts spread into one column per event "
    "type (long -> wide reshaping for feature tables).  The oracle is "
    "the portable conditional-aggregation form, which is also exactly "
    "what Spark compiles pivot() into -- one scan, one shuffle.",
    f"""
    SELECT user_id,
           {", ".join(
               f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
               for t in _PIVOT_TYPES
           )},
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "pivot"),
)
def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot() with the value list GIVEN explicitly -- omitting it
    makes Spark run a blocking distinct scan first to discover the
    columns, which is a schema-inference anti-pattern at 100 TB.
    With the list pinned, the pivot is a single partial+final hash
    agg over (user_id).

    total_value is deliberately NOT derived from the per-type pivot
    sums: that would gate it on the pinned type list and silently
    diverge from the oracle's ungated sum if a sixth event_type ever
    appeared.  It comes from a separate ungated agg on the SAME key,
    joined back -- both sides shuffle on user_id, so the join is
    co-partitioned (no third exchange for the probe side).  The sum
    runs in decimal(18,2): event values carry two decimals, so the
    decimal sum is exact and both engines cast the identical exact
    quantity to the identical double -- no float addition-order or
    .5-boundary rounding hazard (binary doubles cannot represent 0.01
    exactly, so a double partial-sum re-add is NOT order-safe)."""
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value")
    )
    return wide.join(totals, "user_id").select(
        "user_id",
        *[
            F.coalesce(F.col(f"{t}"), F.lit(0)).alias(f"n_{t}")
            for t in _PIVOT_TYPES
        ],
        "total_value",
    )


@register(
    "a12_cube_matrix",
    "CUBE over (orderstatus, orderpriority): all four grouping-set "
    "levels -- detail, per-status, per-priority and grand total -- in "
    "one pass, the full cross-tab behind a two-dimensional drill-down "
    "report (generalizes a11's ROLLUP, which only emits prefix levels).",
    """
    SELECT coalesce(o_orderstatus, '<all>') AS orderstatus,
           coalesce(o_orderpriority, '<all>') AS orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                AS INTEGER) AS gid,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def q_cube_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native cube(): like a11's rollup, Spark plans ONE Expand node
    feeding a single partial+final hash aggregate, so all 2^2 grouping
    sets cost one scan + one shuffle -- the naive alternative (four
    group-bys unioned) scans the fact table four times.  Expand
    multiplies rows 4x BEFORE the partial agg, but map-side combine
    collapses them to |groups| per partition, so the shuffle stays
    group-sized at any scale.  The price sum runs in decimal(18,2):
    Expand feeds each input row to several grouping sets, so partial
    sums re-add in engine-specific orders and only an exact decimal
    sum is order-proof (same rule as p11).  grouping() disambiguates
    real NULL keys from subtotal rows identically in both engines."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("int")
            .alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias(
                "orderstatus"
            ),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias(
                "orderpriority"
            ),
            "gid",
            "n",
            "total_price",
        )
    )
