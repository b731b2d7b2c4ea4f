"""Profiling, explode/unnest, JSON-path, summary-statistics and
window/sessionization queries (reference A7/A8 profiling
osm_structure_audit.py:31-82, E1/E2 $unwind mongo_audit.py:111/283-295,
plus the window-function extension SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t, register


# --- A7: per-key profiling aggregation (osm_structure_audit.py:65-82):
# use count + distinct count + usage ratio, per event type.
@register(
    "a7_event_type_profile",
    "Per-key profiling: use count, distinct users, usage-per-unique ratio "
    "(reference A7 tag profiling, osm_structure_audit.py:31-82).",
    """
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(count(*)::DOUBLE / count(DISTINCT user_id), 2) AS events_per_user,
           round(avg(value), 2) AS avg_value
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "profiling"),
)
def q_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.countDistinct("user_id"), 2
            ).alias("events_per_user"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
    )


# --- A8: summary statistics incl. exact percentiles (main.ipynb cell 8
# describe(percentiles=...)).  Exact percentile (sort-based) on both
# sides; linear interpolation semantics match quantile_cont.
@register(
    "a8_summary_stats",
    "Summary statistics with exact percentiles (reference A8 describe, "
    "main.ipynb cell 8).",
    """
    SELECT l_returnflag,
           count(*) AS n,
           round(avg(l_extendedprice), 2) AS mean_price,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           round(list_sort(list(l_extendedprice))
                 [CAST(floor(0.25 * (count(*) - 1)) AS BIGINT) + 1], 2) AS p25,
           round(list_sort(list(l_extendedprice))
                 [CAST(floor(0.50 * (count(*) - 1)) AS BIGINT) + 1], 2) AS p50,
           round(list_sort(list(l_extendedprice))
                 [CAST(floor(0.75 * (count(*) - 1)) AS BIGINT) + 1], 2) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "profiling"),
)
def q_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DISCRETE (lower) percentiles -- the element at floor(p*(n-1)) of
    # the sorted group -- because interpolating percentiles are
    # engine-formula-dependent at the half-ulp level: Spark's
    # percentile() and DuckDB's quantile_cont produce values one cent
    # apart after round(.., 2) on knife-edge midpoints (observed at
    # sf0.001).  The discrete index rule is bit-identical everywhere.
    # At corpus scale swap collect_list for approx_percentile; this is
    # the reference's exact-profiling twin (main.ipynb cell 8).
    li = _t(spark, sf_dir, "lineitem")

    def pdisc(p: float) -> F.Column:
        arr = F.array_sort(F.collect_list("l_extendedprice"))
        idx = F.floor(F.lit(p) * (F.count(F.lit(1)) - 1)).cast("int")
        return F.round(F.get(arr, idx), 2)

    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_extendedprice"), 2).alias("mean_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        pdisc(0.25).alias("p25"),
        pdisc(0.50).alias("p50"),
        pdisc(0.75).alias("p75"),
    )


# --- E1: $unwind with position (mongo_audit.py:111 et al.).
@register(
    "e1_posexplode_embeddings",
    "Positional explode of an array column (reference E1 $unwind, "
    "mongo_audit.py:111).",
    """
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) AS BIGINT) AS idx,
           round(unnest(embedding)::DOUBLE, 6) AS val
    FROM embeddings
    WHERE vec_id < 50
    """,
    tags=("explode",),
)
def q_posexplode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("idx"),
        F.round("col", 6).alias("val"),
    )


# --- E2: $unwind preserveNullAndEmptyArrays == explode_outer
# (mongo_audit.py:283-295): docs failing the split predicate keep a
# null token row instead of disappearing.
@register(
    "e2_explode_outer_tokens",
    "Outer explode preserving rows with null arrays (reference E2 $unwind "
    "preserveNullAndEmptyArrays, mongo_audit.py:283-295).",
    """
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE n_chars < 130
    UNION ALL
    SELECT doc_id, NULL AS token
    FROM documents WHERE n_chars >= 130
    """,
    tags=("explode",),
)
def q_explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.when(F.col("n_chars") < 130, F.split(F.col("text"), " ")).otherwise(
        F.lit(None).cast("array<string>")
    )
    return docs.select("doc_id", F.explode_outer(toks).alias("token"))


# --- JSON path extraction (the open props space; SURVEY.md §1.3 MapType
# long-tail analog -- the reference's dynamic tag keys).
@register(
    "p_json_extract_props",
    "JSON-path field extraction from the open props column (dynamic "
    "key space, SURVEY.md §1.3; reference open tag space §1.1).",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n
    FROM events
    GROUP BY k_bucket
    """,
    tags=("json",),
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select((k % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- Streaming-equivalent tumbling window aggregation.  The streaming
# module (streaming/events.py) runs the same plan with readStream +
# watermark; this batch twin is the oracle-checkable version.
@register(
    "s1_tumbling_window_counts",
    "Tumbling 5-minute window aggregation over the event stream (batch "
    "twin of streaming/events.py; reference has no streaming -- "
    "SURVEY.md §2.10 extension).",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
    tags=("streaming", "agg"),
)
def q_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


# --- Window functions (extension; absent in the reference, SURVEY §2.10).
@register(
    "w1_running_order_totals",
    "Row numbering + running sum per customer (window-function extension, "
    "SURVEY.md §2.10).",
    """
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW), 2) AS running_total
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def q_running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
    )


@register(
    "w2_top2_orders_per_customer",
    "Per-group top-k via ranking window (extension; global top-k is "
    "reference O1, mongo_audit.py:361-362).",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_custkey < 200
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 2
    """,
    tags=("window", "topk"),
)
def q_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "w3_user_sessions",
    "Sessionization: lag-gap > 30 min starts a new session; session count "
    "and event count per user (window extension, SURVEY.md common OLAP "
    "patterns).",
    """
    SELECT user_id,
           CAST(max(session_id) + 1 AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM (
      SELECT user_id,
             sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               date_diff('second',
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         ts) AS gap_s
        FROM events
      )
    )
    GROUP BY user_id
    """,
    tags=("window", "sessionize"),
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = marked.withColumn("session_id", F.sum("new_sess").over(w) - 1)
    return sess.groupBy("user_id").agg(
        (F.max("session_id") + 1).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "s2_sliding_window_rates",
    "Sliding 10-minute window with 5-minute slide over the event stream "
    "(batch twin of streaming/events.py sliding_window_rates -- the SAME "
    "operator runs under readStream with a watermark; SURVEY.md §2.10 "
    "extension).  Each event lands in window/slide = 2 windows.",
    """
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           event_type, count(*) AS n
    FROM (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes',
             event_type
      FROM events
    )
    GROUP BY window_start, event_type
    """,
    tags=("streaming", "window", "agg"),
)
def q_sliding_window_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import sliding_window_rates

    ev = _t(spark, sf_dir, "events")
    return sliding_window_rates(ev, window="10 minutes", slide="5 minutes")


@register(
    "w4_session_window_native",
    "Per-user sessions via Spark's NATIVE session_window operator "
    "(dynamic-gap session windows, JVM-side, the same operator the "
    "streaming path uses with a watermark) -- the built-in twin of "
    "w3's manual lag-gap sessionization: per session, its start, "
    "event count, and value total.",
    """
    SELECT user_id, session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (
      SELECT user_id, ts, value,
             min(ts) OVER (PARTITION BY user_id, session_id) AS session_start
      FROM (
        SELECT user_id, ts, value,
               sum(CASE WHEN gap_s IS NULL OR gap_s >= 1800 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        FROM (
          SELECT user_id, ts, event_id, value,
                 date_diff('second',
                           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                           ts) AS gap_s
          FROM events
        )
      )
    )
    GROUP BY user_id, session_start
    """,
    tags=("window", "sessionize", "streaming"),
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``F.session_window(ts, gap)`` merges an event into the current
    session while its gap to the previous event is STRICTLY below the
    gap duration (a gap of exactly 30:00 starts a new session) -- the
    oracle mirrors that with ``gap_s >= 1800``.  Session start == the
    session's min event time in both formulations.  Note the boundary
    convention differs from w3 (``> 1800``) by design: w3 reproduces
    the lag-gap idiom, w4 reproduces the native operator's semantics.

    Scale: one shuffle on user_id, sessions merged inside each
    partition (sort-based); no window-function second pass -- this is
    the plan shape Structured Streaming runs incrementally with
    ``withWatermark`` + state store."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


# One oracle for BOTH physical as-of strategies (aj1 plain window,
# aj3 time-bucketed): the LATERAL formulation pins the semantics the
# bucketing must preserve exactly.
_ASOF_SQL = """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT event_id, ts
      FROM events c
      WHERE c.event_type = 'click'
        AND c.user_id = p.user_id
        AND c.ts <= p.ts
      ORDER BY c.ts DESC, c.event_id DESC
      LIMIT 1
    ) c ON true
    """


def _asof_clicks(spark, sf_dir: str, skewed: bool) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return asof_join(
        purchases, clicks, on="user_id", ts="ts", idc="event_id",
        skewed=skewed, bucket="1 day",
    ).select(
        F.col("_id").alias("purchase_id"),
        F.col("_k").alias("user_id"),
        F.col("_ts").alias("purchase_ts"),
        F.col("asof_id").alias("click_id"),
        F.col("asof_ts").alias("click_ts"),
    )


@register(
    "aj1_asof_join",
    "As-of join (the time-series operator Spark lacks natively): each "
    "purchase event attributed to the user's most recent click at or "
    "before it (tiebreak: max click event_id).  Implemented as the "
    "scalable union+window formulation -- ONE shuffle on user_id, a "
    "single sort-based window carrying the last click forward -- not a "
    "per-key lateral loop or a range cross-join.",
    _ASOF_SQL,
    tags=("join", "asof", "timeseries"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/asof.asof_join, plain path: union both event roles,
    window per user ordered by (ts, clicks-before-purchases, event_id)
    -- the carried last non-null click at each purchase row IS the
    as-of match.  The oracle's LATERAL formulation pins the semantics
    (max (ts, event_id) click with ts <= purchase ts); at equal ts the
    click sorts first, so the join is inclusive.  100 TB shape: one
    hash exchange on the join key and a per-key sort -- the same cost
    as a groupBy, with no row-count blowup.  Skew caveat: AQE does NOT
    split window partitions (only joins/aggs), so one pathologically
    hot key serializes its sort; aj3 is the same operator with
    skewed=True (time-bucketed window salting) for that case."""
    return _asof_clicks(spark, sf_dir, skewed=False)


@register(
    "aj3_asof_join_skewed",
    "The SAME as-of join under the skew-resistant strategy: the window "
    "key is salted with a coarse time bucket so a hot user's sort "
    "spreads over one task per bucket; cross-bucket matches are "
    "repaired by a carry-forward join over per-(user, bucket) click "
    "summaries, whose row count is bounded by the time span -- not the "
    "hot key's event count.  Oracle identical to aj1: the bucketing "
    "must be invisible in the result.",
    _ASOF_SQL,
    tags=("join", "asof", "timeseries", "skew"),
)
def q_asof_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/asof.asof_join with skewed=True, bucket='1 day': see
    that module's docstring for the carry-forward construction and the
    shuffle accounting (2 keyed exchanges of the event frame vs aj1's
    1, each with per-task input bounded by bucket width).  The planted
    hot-user equality test lives in tests/test_skew_stress.py."""
    return _asof_clicks(spark, sf_dir, skewed=True)


@register(
    "hr1_hypertable_rollup",
    "Hypertable-style cascaded rollup (continuous-aggregate pattern): "
    "the hourly aggregate is computed FROM the 1-minute partial "
    "aggregates (sum/count partials re-aggregated; the per-hour "
    "partial count itself is a top-level metric), not from raw events -- the incremental-materialization "
    "shape where each coarser resolution reads the much smaller finer "
    "level.  The oracle aggregates raw events straight to hourly, so "
    "the cascade must be exactly associativity-correct.",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(DISTINCT time_bucket(INTERVAL '1 minute', ts)) AS n_minutes
    FROM events
    GROUP BY hour_start, event_type
    """,
    tags=("timeseries", "rollup", "agg"),
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level 0: raw -> 1-minute partials (count + sum, the mergeable
    state).  Level 1: hourly = re-aggregation of 60x-fewer partial
    rows; n_minutes (partials per hour) only EXISTS at the cascade
    level -- the oracle must reconstruct it as a distinct-count over
    raw timestamps, pinning that the cascade groups correctly.
    Ratio metrics (avg) belong one layer up, derived from sum/count;
    emitting them here would hit engine rounding-mode differences on
    exact .5 ulp boundaries (observed: Spark half-up vs DuckDB
    half-even at sum/8).  At 100 TB
    the minute partials are the materialized continuous aggregate a
    streaming job maintains incrementally; every coarser dashboard
    resolution reads THEM, never the raw hypertable.  Both
    aggregations are partial+final hash aggs; the minute level
    pre-partitions by (bucket, type) so the hourly shuffle is tiny.
    The level functions are shared with streaming/events.py, whose
    streaming form maintains level 0 incrementally (pytest ties
    stream == this batch cascade)."""
    from ..streaming.events import (
        minute_partial_counts,
        rollup_hourly_from_partials,
    )

    ev = _t(spark, sf_dir, "events")
    return rollup_hourly_from_partials(minute_partial_counts(ev))


_SK_BINS = 1024
_SK_QS = (0.5, 0.9, 0.99)


@register(
    "sk1_quantile_sketch",
    "Mergeable quantile sketch: fixed-width 1024-bin histogram over "
    "l_extendedprice, quantiles read off the cumulative bin counts -- "
    "the associative-partials pattern (each partition builds a partial "
    "histogram, partials merge by addition) that answers percentile "
    "questions at 100 TB in one pass without a global sort.  Bin "
    "arithmetic is plain IEEE double, so the DuckDB oracle reproduces "
    "the sketch bit-for-bit: the check pins the sketch itself, with "
    "error bounded by one bin width by construction.",
    f"""
    WITH stats AS (
      SELECT min(l_extendedprice) AS mn,
             greatest((max(l_extendedprice) - min(l_extendedprice))
                      / {_SK_BINS}, 1e-12) AS w,
             count(*) AS n
      FROM lineitem
    ),
    hist AS (
      SELECT least(CAST(floor((l_extendedprice - mn) / w) AS BIGINT),
                   {_SK_BINS - 1}) AS bin,
             count(*) AS cnt
      FROM lineitem, stats
      GROUP BY bin
    ),
    cum AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin) AS cum_n
      FROM hist
    )
    SELECT q.p,
           min(cum.bin) AS bin,
           round(min(stats.mn + (cum.bin + 1) * stats.w), 4) AS est_hi
    FROM (SELECT CAST(unnest([{", ".join(str(q) for q in _SK_QS)}]) AS DOUBLE) AS p) q
    CROSS JOIN stats
    JOIN cum ON cum.cum_n >= ceil(q.p * stats.n)
    GROUP BY q.p
    """,
    tags=("sketch", "agg", "profiling"),
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan for (min, max, n), one scan binned into a 1024-row
    histogram (partial+final hash agg -- the partials ARE the
    mergeable sketch), then driver-sized work: a running sum over
    1024 rows and three lookups.  Contrast with exact percentiles
    (a8): those sort every group; this never sorts anything larger
    than the bin table, at the cost of a one-bin-width error bound."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    stats = li.agg(
        F.min("l_extendedprice").alias("mn"),
        # Zero-width guard (all-equal input): the epsilon floor keeps the
        # ANSI division alive and degrades to "everything in bin 0"; it
        # is applied identically in the oracle so the sketch stays
        # bit-for-bit on non-degenerate input too.
        F.greatest(
            (F.max("l_extendedprice") - F.min("l_extendedprice")) / _SK_BINS,
            F.lit(1e-12),
        ).alias("w"),
        F.count(F.lit(1)).alias("n"),
    )
    hist = (
        li.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("l_extendedprice") - F.col("mn")) / F.col("w")).cast(
                    "long"
                ),
                F.lit(_SK_BINS - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.select(
        "bin",
        F.sum("cnt").over(Window.orderBy("bin")).alias("cum_n"),
    )
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in _SK_QS])
    ).alias("p")
    return (
        cum.crossJoin(F.broadcast(stats))
        .select("bin", "cum_n", "mn", "w", "n")
        .crossJoin(li.sparkSession.range(1).select(qs).select("p"))
        .filter(F.col("cum_n") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("p")
        .agg(
            F.min("bin").alias("bin"),
            F.round(
                F.min(F.col("mn") + (F.col("bin") + 1) * F.col("w")), 4
            ).alias("est_hi"),
        )
    )


@register(
    "aj2_interval_join_pairs",
    "Bounded-lookback interval join: every (purchase, click) pair of "
    "the same user with the click at most 1 hour before the purchase "
    "-- the attribution-window join, and the batch twin of the "
    "stream-stream event-time range join (streaming/events.py; "
    "watermarks bound the join state exactly because the range is "
    "bounded).",
    """
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    """,
    tags=("join", "interval", "streaming"),
)
def q_interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key on user_id with the time range as a join residual:
    Spark plans a shuffle join on the key, and the bounded range is
    what makes the STREAMING form viable -- each side's state expires
    once the watermark passes the 1-hour window, so state is O(rate x
    window), not O(history).  The unbounded as-of (aj1) cannot stream
    for exactly this reason."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select("purchase_id", "click_id", "user_id")
    )


_HLL_M = 256  # registers; first two hex chars of the hash


@register(
    "sk2_hll_sketch",
    "Mergeable cardinality sketch (explicit HyperLogLog): per-language "
    "distinct-text estimation state built from md5 bits -- register = "
    "first byte of the hash, rank = leading-zeros+1 of the next 60 "
    "bits, per-register max.  The oracle reproduces the REGISTERS and "
    "the harmonic denominator bit-for-bit (sums of powers of two are "
    "exact in IEEE doubles), pinning the sketch itself; the log-based "
    "estimate is derived downstream (tests/test_hll.py asserts its "
    "accuracy) because cross-engine libm ulp differences make logs "
    "unpinnable -- the sums+counts-not-ratios oracle rule.",
    f"""
    WITH hashed AS (
      SELECT lang, md5(text) AS h FROM documents
    ),
    ranked AS (
      SELECT lang,
             strpos('0123456789abcdef', substr(h, 1, 1)) * 16
               + strpos('0123456789abcdef', substr(h, 2, 1)) - 17 AS bucket,
             CASE WHEN b1 = 0 THEN 61 ELSE b1 END AS rank
      FROM (
        SELECT lang, h,
               strpos(array_to_string(list_transform(range(3, 18), i ->
                 lpad(bin(strpos('0123456789abcdef',
                                 substr(h, CAST(i AS INT), 1)) - 1), 4, '0')),
                 ''), '1') AS b1
        FROM hashed
      )
    ),
    registers AS (
      SELECT lang, bucket, max(rank) AS m_rank
      FROM ranked GROUP BY lang, bucket
    )
    SELECT r.lang,
           CAST({_HLL_M} AS INT) AS m,
           CAST({_HLL_M} - count(*) AS INT) AS n_zero_registers,
           round(sum(power(0.5, m_rank)) + ({_HLL_M} - count(*)), 6)
             AS harmonic_denom,
           e.n_exact
    FROM registers r
    JOIN (SELECT lang, CAST(count(DISTINCT h) AS BIGINT) AS n_exact
          FROM hashed GROUP BY lang) e ON r.lang = e.lang
    GROUP BY r.lang, e.n_exact
    """,
    tags=("sketch", "agg", "profiling"),
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: the register table IS the mergeable state -- one
    partial+final hash agg builds per-partition partials that merge by
    max, then a per-group rollup of 256 rows; no distinct, no sort,
    constant state per group.  Expressions are shared verbatim with
    the oracle (conv/bin/lpad string-bit arithmetic), so the sketch is
    engine-pinned, unlike approx_count_distinct whose HLL++ internals
    are Spark-private.  The exact distinct rides along for the
    accuracy pytest; a production run would drop it (that is the
    point of the sketch)."""
    docs = _t(spark, sf_dir, "documents")
    hashed = docs.selectExpr("lang", "md5(text) AS h")
    ranked = hashed.selectExpr(
        "lang",
        "h",
        "conv(substring(h, 1, 2), 16, 10) AS bucket",
        "instr(array_join(transform(sequence(3, 17), i -> "
        "lpad(bin(conv(substring(h, i, 1), 16, 10)), 4, '0')), ''), '1') AS b1",
    ).selectExpr(
        "lang",
        "h",
        "CAST(bucket AS INT) AS bucket",
        "CASE WHEN b1 = 0 THEN 61 ELSE b1 END AS rank",
    )
    registers = ranked.groupBy("lang", "bucket").agg(
        F.max("rank").alias("m_rank")
    )
    exact = hashed.groupBy("lang").agg(
        F.countDistinct("h").cast("bigint").alias("n_exact")
    )
    return (
        registers.groupBy("lang")
        .agg(
            F.lit(_HLL_M).cast("int").alias("m"),
            (F.lit(_HLL_M) - F.count(F.lit(1))).cast("int").alias(
                "n_zero_registers"
            ),
            F.round(
                F.sum(F.pow(F.lit(0.5), F.col("m_rank")))
                + (F.lit(_HLL_M) - F.count(F.lit(1))),
                6,
            ).alias("harmonic_denom"),
        )
        .join(exact, "lang")
        .select("lang", "m", "n_zero_registers", "harmonic_denom", "n_exact")
    )


_CM_W = 256  # sketch width (columns per hash row)
_CM_D = 4  # sketch depth (independent hash rows)


@register(
    "sk3_countmin_heavy_hitters",
    "Mergeable frequency sketch (explicit Count-Min): per-event-stream "
    "user frequencies summarized into a 4x256 counter grid -- row j's "
    "hash is the first byte of md5(j||'|'||user) -- then the top-10 "
    "true-heaviest users are estimated as min-over-rows of their "
    "counters.  Counters are exact integer counts derived from the "
    "same md5 arithmetic in both engines, so the SKETCH STATE and the "
    "estimates are pinned bit-for-bit; est_n >= true_n by "
    "construction (the CM one-sided error bound, asserted in "
    "tests/test_sketches.py).",
    f"""
    WITH hashed AS (
      SELECT jj.j,
             md5(CAST(jj.j AS VARCHAR) || '|' || CAST(ev.user_id AS VARCHAR))
               AS h
      FROM events ev
      CROSS JOIN (SELECT unnest(range({_CM_D})) AS j) jj
    ),
    counters AS (
      SELECT j,
             strpos('0123456789abcdef', substr(h, 1, 1)) * 16
               + strpos('0123456789abcdef', substr(h, 2, 1)) - 17 AS bucket,
             count(*) AS c
      FROM hashed GROUP BY 1, 2
    ),
    truth AS (
      SELECT user_id, count(*) AS true_n
      FROM events GROUP BY user_id
      ORDER BY true_n DESC, user_id LIMIT 10
    ),
    cand AS (
      SELECT t.user_id, t.true_n, jj.j,
             md5(CAST(jj.j AS VARCHAR) || '|' || CAST(t.user_id AS VARCHAR))
               AS h
      FROM truth t
      CROSS JOIN (SELECT unnest(range({_CM_D})) AS j) jj
    ),
    cand_b AS (
      SELECT user_id, true_n, j,
             strpos('0123456789abcdef', substr(h, 1, 1)) * 16
               + strpos('0123456789abcdef', substr(h, 2, 1)) - 17 AS bucket
      FROM cand
    )
    SELECT c.user_id, c.true_n, CAST(min(ct.c) AS BIGINT) AS est_n
    FROM cand_b c JOIN counters ct ON ct.j = c.j AND ct.bucket = c.bucket
    GROUP BY c.user_id, c.true_n
    """,
    tags=("sketch", "agg", "profiling"),
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: the 4x256 counter grid IS the mergeable state --
    the explode(sequence) multiplies rows 4x BEFORE the partial agg,
    but map-side combine collapses each partition to <=1024 partial
    counters, so the shuffle carries sketch-sized state regardless of
    input size (the same partial+final shape as sk1/sk2).  The truth
    side is a TakeOrderedAndProject top-10 (driver merges per-partition
    heaps; no global sort), and the probe joins 40 candidate rows
    against the 1024-row counter table -- both broadcast-sized by
    construction.  A production run drops the truth column; it rides
    along here to pin the one-sided error bound under the oracle."""
    ev = _t(spark, sf_dir, "events")
    hashed = ev.select("user_id").selectExpr(
        "user_id", f"explode(sequence(0, {_CM_D - 1})) AS j"
    ).selectExpr(
        "j",
        f"CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', "
        f"CAST(user_id AS STRING))), 1, 2), 16, 10) AS INT) AS bucket",
    )
    counters = hashed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))
    truth = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.col("true_n").desc(), "user_id")
        .limit(10)
    )
    cand = truth.selectExpr(
        "user_id", "true_n", f"explode(sequence(0, {_CM_D - 1})) AS j"
    ).selectExpr(
        "user_id",
        "true_n",
        "j",
        "CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', "
        "CAST(user_id AS STRING))), 1, 2), 16, 10) AS INT) AS bucket",
    )
    return (
        cand.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").cast("bigint").alias("est_n"))
    )


_BF_M = 2048  # bloom filter bits
_BF_K = 4  # hash functions
_BF_PROBES = 5000  # deterministic probe domain: user_id in [0, 5000)


@register(
    "sk4_bloom_membership",
    "Mergeable membership sketch (explicit Bloom filter): the set of "
    "signup users is summarized into a 2048-bit filter (bit j,u = "
    "md5(j||'|'||u) mod 2048, 4 hashes), then a fixed 5000-user probe "
    "domain is answered from the BITS ALONE and cross-tabbed against "
    "ground truth -- zero false negatives by construction, false "
    "positives counted.  Bit positions are exact integer md5 "
    "arithmetic in both engines, so the filter state (n_set_bits "
    "rides on every row) and every probe answer are pinned.",
    f"""
    WITH members AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    ),
    bits AS (
      SELECT DISTINCT
             (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
               % {_BF_M} AS bit
      FROM (
        SELECT md5(CAST(jj.j AS VARCHAR) || '|'
                   || CAST(m.user_id AS VARCHAR)) AS h
        FROM members m
        CROSS JOIN (SELECT unnest(range({_BF_K})) AS j) jj
      )
    ),
    probes AS (
      SELECT unnest(range({_BF_PROBES})) AS user_id
    ),
    probe_bits AS (
      SELECT user_id, j,
             (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
               % {_BF_M} AS bit
      FROM (
        SELECT p.user_id, jj.j,
               md5(CAST(jj.j AS VARCHAR) || '|'
                   || CAST(p.user_id AS VARCHAR)) AS h
        FROM probes p
        CROSS JOIN (SELECT unnest(range({_BF_K})) AS j) jj
      )
    ),
    answers AS (
      SELECT pb.user_id,
             count(b.bit) = {_BF_K} AS bloom_positive
      FROM probe_bits pb LEFT JOIN bits b ON b.bit = pb.bit
      GROUP BY pb.user_id
    )
    SELECT a.bloom_positive,
           m.user_id IS NOT NULL AS is_member,
           count(*) AS n_probes,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_set_bits
    FROM answers a LEFT JOIN members m ON m.user_id = a.user_id
    GROUP BY 1, 2
    """,
    tags=("sketch", "agg", "join"),
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: the bit set IS the mergeable state (bitwise-OR =
    distinct-union of positions) -- built with one partial+final
    distinct over <=2048 ints, so the shuffle carries filter-sized
    state no matter how large the member set; probes answer against a
    broadcast of the bits with NO access to the member table, which
    is the whole point of shipping a Bloom filter to 1000 executors
    instead of the set itself.  The truth join rides along only to
    pin the FP/FN cross-tab under the oracle."""
    ev = _t(spark, sf_dir, "events")
    members = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
    )
    bit_expr = (
        "CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', "
        f"CAST(user_id AS STRING))), 1, 3), 16, 10) % {_BF_M} AS INT) AS bit"
    )
    bits = (
        members.selectExpr("user_id", f"explode(sequence(0, {_BF_K - 1})) AS j")
        .selectExpr(bit_expr)
        .distinct()
    )
    probes = spark.range(_BF_PROBES).select(F.col("id").alias("user_id"))
    probe_bits = probes.selectExpr(
        "user_id", f"explode(sequence(0, {_BF_K - 1})) AS j"
    ).selectExpr("user_id", bit_expr)
    answers = (
        probe_bits.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .join(probes, "user_id", "right")
        .select(
            "user_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) == _BF_K).alias(
                "bloom_positive"
            ),
        )
    )
    n_set = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_set_bits"))
    return (
        answers.join(
            members.withColumn("_m", F.lit(True)), "user_id", "left"
        )
        .groupBy(
            "bloom_positive",
            F.col("_m").isNotNull().alias("is_member"),
        )
        .agg(F.count(F.lit(1)).alias("n_probes"))
        .crossJoin(F.broadcast(n_set))
    )


@register(
    "w5_cumulative_distinct_users",
    "Daily actives + CUMULATIVE distinct users: per day, how many "
    "distinct users were active and how many users had ever been seen "
    "by that day -- the growth-curve query.  Naive windowed "
    "count-distinct holds per-frame sets; this is the first-seen "
    "rewrite: distinct-per-user min(day), then a day-level running "
    "sum, so no set state ever exceeds a counter.",
    """
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS n_active
      FROM events GROUP BY 1
    ),
    news AS (
      SELECT first_day AS day, count(*) AS n_new FROM firsts GROUP BY 1
    )
    SELECT d.day,
           d.n_active,
           coalesce(n.n_new, 0) AS n_new,
           CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY d.day) AS BIGINT)
             AS n_cumulative
    FROM daily d LEFT JOIN news n ON n.day = d.day
    """,
    tags=("window", "agg", "timeseries"),
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first-seen rewrite is what survives scale: a windowed
    COUNT(DISTINCT) over an unbounded preceding frame would hold a
    per-frame user set (O(users) state PER DAY); min-per-user + a
    running sum over |days| rows keeps all heavy aggregation in
    partial+final hash aggs keyed on user, and the only window runs
    over the day-level rollup -- driver-trivial cardinality at any
    scale (this is also the incremental form a streaming job
    maintains).  The final single-partition window is over |days|
    rows, not events."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = ev.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    news = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(news, "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn(
            "n_cumulative", F.sum("n_new").over(w).cast("bigint")
        )
    )


@register(
    "hr2_ohlc_bars",
    "Timeseries downsampling to OHLC bars: per (event_type, hour) the "
    "open/high/low/close of value plus row count -- the canonical "
    "lossy rollup a monitoring or market pipeline stores instead of "
    "raw ticks.  Open/close are argmin/argmax by an "
    "arithmetic (epoch-micros * 10^12 + event_id) decimal key -- "
    "unique, identically ordered in both engines for any long "
    "inputs.",
    """
    SELECT event_type,
           date_trunc('hour', ts) AS bar_ts,
           CAST(arg_min(CAST(value AS DECIMAL(18,2)),
                        epoch_us(ts)::HUGEINT * 1000000000000 + event_id)
                AS DOUBLE) AS open,
           CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS high,
           CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS low,
           CAST(arg_max(CAST(value AS DECIMAL(18,2)),
                        epoch_us(ts)::HUGEINT * 1000000000000 + event_id)
                AS DOUBLE) AS close,
           count(*) AS n_ticks
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "timeseries"),
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One partial+final hash agg keyed on (type, hour): min_by/max_by
    partials carry a single (value, key) pair each, so the shuffle is
    bar-sized, never tick-sized -- the same mergeable-state discipline
    as the sketches, and exactly how a continuous aggregate (hr1)
    would maintain bars incrementally.  The arithmetic (epoch-micros,
    event_id) tiebreak makes open/close well-defined even with
    duplicate timestamps; decimal casts keep extrema exact (p11 rule)."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    # Deterministic total order as ARITHMETIC, not string formatting:
    # epoch_micros * 10^12 + event_id in decimal(38,0)/HUGEINT.  The
    # old zero-padded %020d%012d key silently broke lexicographic
    # ordering for negative epochs or event_id >= 10^12 (%d just widens
    # the field); the arithmetic key stays numerically ordered for any
    # long inputs and equals (ts, event_id) lex order whenever
    # 0 <= event_id < 10^12 (the generator domain; asserted in
    # tests/test_streaming.py).
    key = (
        F.unix_micros("ts").cast("decimal(38,0)") * F.lit(10**12)
        + F.col("event_id")
    )
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bar_ts")
        )
        .agg(
            F.min_by(v, key).cast("double").alias("open"),
            F.max(v).cast("double").alias("high"),
            F.min(v).cast("double").alias("low"),
            F.max_by(v, key).cast("double").alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@register(
    "o4_exact_group_percentiles",
    "EXACT per-group percentiles (p25/p50/p95 of event value per "
    "type): the precise counterpart of the sk1 sketch -- linear "
    "interpolation at rank p*(n-1), the definition both engines "
    "share (Spark percentile == DuckDB quantile_cont).  This is the "
    "operator you run when the group count is small and exactness is "
    "contractual (SLA reporting); sk1 is what replaces it when "
    "per-group data no longer fits a sort.",
    """
    SELECT event_type,
           count(*) AS n,
           round(quantile_cont(CAST(value AS DOUBLE), 0.25), 2) AS p25,
           round(quantile_cont(CAST(value AS DOUBLE), 0.5), 2) AS p50,
           round(quantile_cont(CAST(value AS DOUBLE), 0.95), 2) AS p95
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def q_exact_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's percentile() is an exact typed aggregate: partials
    collect per-partition value buffers and the final merge sorts
    once per group -- O(group size) memory on the merging executor,
    which is precisely the scale ceiling the docstring assigns it
    (five groups here; a million-key groupBy would use
    approx_percentile or sk1 instead).  One partial+final agg, no
    window, no global sort; both engines interpolate at p*(n-1) so
    round(,2) only guards the last ulp of the division."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.95)"), 2).alias("p95"),
    )


@register(
    "hr3_gapfill_locf",
    "Timeseries gap-fill with last-observation-carried-forward: the "
    "sparse per-minute signup bars are re-gridded onto the complete "
    "minute spine between the first and last observation; missing "
    "minutes get n=0, an is_gap flag, and the value total carried "
    "forward from the last real bar -- time_bucket_gapfill + locf, "
    "the query every monitoring dashboard runs over irregular data.",
    """
    WITH bars AS (
      SELECT date_trunc('minute', ts) AS m,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s
      FROM events WHERE event_type = 'signup'
      GROUP BY 1
    ),
    bounds AS (SELECT min(m) AS lo, max(m) AS hi FROM bars),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS m
      FROM bounds
    )
    SELECT s.m AS minute_ts,
           coalesce(b.n, 0) AS n,
           CAST(last_value(b.s IGNORE NULLS)
                OVER (ORDER BY s.m ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS DOUBLE) AS filled_total,
           b.n IS NULL AS is_gap
    FROM spine s LEFT JOIN bars b ON b.m = s.m
    """,
    tags=("timeseries", "window", "agg"),
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bars aggregate is the only input-sized stage (one
    partial+final hash agg); the spine is generated, not scanned --
    sequence() between the broadcast min/max -- so the gap-fill join
    and the LOCF window run over |minutes| rows regardless of event
    volume.  The single unpartitioned window is spine-sized (tens of
    thousands of rows for a year of minutes); a multi-series gapfill
    partitions it by series key, which is the 100 TB form.  Decimal
    bar totals make the carried value exact (p11 rule); the first
    spine row always has an observation (the spine starts AT the
    first bar), so LOCF never reads before the window."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    bars = ev.groupBy(F.date_trunc("minute", "ts").alias("m")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
    )
    bounds = bars.agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.expr("sequence(lo, hi, INTERVAL 1 MINUTE)")
        ).alias("m")
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(bars, "m", "left")
        .select(
            F.col("m").alias("minute_ts"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("s", ignorenulls=True).over(w).cast("double").alias(
                "filled_total"
            ),
            F.col("n").isNull().alias("is_gap"),
        )
    )


@register(
    "aj4_point_in_time_join",
    "Point-in-time (temporal dimension) join: every purchase looks up "
    "the user's state -- the m7-style SCD2 dimension built from the "
    "NON-purchase event stream -- as of strictly before the purchase "
    "in the (ts, event_id) total order; purchases before any state "
    "read 'none'.  The warehouse primitive behind as-of dimension "
    "lookups (training-data feature backfill without leakage).",
    """
    WITH changes AS (
      SELECT user_id, state, ts, event_id FROM (
        SELECT user_id, event_type AS state, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events WHERE event_type <> 'purchase'
      ) WHERE prev IS NULL OR state <> prev
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts,
             CAST(value AS DECIMAL(18,2)) AS value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           coalesce(
             (SELECT c.state FROM changes c
              WHERE c.user_id = p.user_id
                AND (c.ts < p.ts
                     OR (c.ts = p.ts AND c.event_id < p.purchase_id))
              ORDER BY c.ts DESC, c.event_id DESC LIMIT 1),
             'none') AS state_at,
           CAST(p.value AS DOUBLE) AS value
    FROM p
    """,
    tags=("join", "asof", "scd", "window"),
)
def q_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated per-purchase lookup the oracle runs is O(F x D)
    at scale; the production form here is the aj1 union+window
    rewrite applied to a DIMENSION: state-change rows and purchases
    union into one stream, ONE shuffle on user_id, and a last-non-null
    window over the shared (ts, event_id) sort resolves every lookup
    with no row blowup and no range predicate -- the plan cost is one
    exchange + one sort no matter how many interval rows the SCD2
    dimension holds.  rowsBetween(..., -1) gives the strictly-before
    semantics; (ts, event_id) is a total order so both engines pick
    the identical change row."""
    ev = _t(spark, sf_dir, "events")
    wchg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            "ts",
            "event_id",
            F.lag("event_type").over(wchg).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("state") != F.col("prev")))
        .select(
            "user_id",
            "state",
            "ts",
            "event_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(None).cast("decimal(18,2)").alias("value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.lit(None).cast("string").alias("state"),
        "ts",
        "event_id",
        F.col("event_id").alias("purchase_id"),
        F.col("value").cast("decimal(18,2)").alias("value"),
    )
    merged = changes.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        merged.withColumn(
            "state_at", F.last("state", ignorenulls=True).over(w)
        )
        .filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.coalesce("state_at", F.lit("none")).alias("state_at"),
            F.col("value").cast("double").alias("value"),
        )
    )
