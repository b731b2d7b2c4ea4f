"""As-of join (reference has no counterpart; SURVEY.md extension
surface -- the time-series attribution operator Spark lacks natively).

Semantics: every LEFT row is matched to the RIGHT row with the largest
``(ts, id)`` among rows of the same key with ``right.ts <= left.ts``
(inclusive at equal ts; the id breaks ts ties deterministically).

Two physical strategies, identical results:

* ``skewed=False`` -- the union+window formulation: one hash exchange
  on the key, one per-key sort, the carried last-non-null right state
  at each left row IS the match.  No row-count blowup, same cost class
  as a groupBy.  Weakness: AQE splits skewed JOIN/AGG partitions but
  NOT window partitions, so one pathologically hot key serializes its
  entire sort on one task.

* ``skewed=True`` -- time-bucketed window salting: the window key
  becomes ``(key, time_bucket)``, so a hot key's rows spread over as
  many tasks as it spans buckets and no task ever sorts more than one
  bucket's worth.  Matches that cross a bucket boundary are repaired
  with a carry-forward join: per ``(key, bucket)`` the last right row
  is aggregated (an AGG, which AQE *can* split), a per-key window over
  that bucket-summary frame (rows == distinct buckets per key --
  bounded by the time span / bucket width, INDEPENDENT of the hot
  key's row count) computes each bucket's carry-in state, and the main
  frame joins it back on ``(key, bucket)`` -- co-partitioned with the
  bucketed window's own exchange.  Net: ~2 keyed exchanges of the big
  frame instead of 1, in exchange for per-task input bounded by bucket
  width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Marker column values: right rows sort BEFORE left rows at equal ts,
#: making the as-of inclusive.
_RIGHT, _LEFT = 1, 0


def _union_tagged(
    left: DataFrame, right: DataFrame, on: str, ts: str, idc: str
) -> DataFrame:
    return right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(idc).alias("_id"),
        F.lit(_RIGHT).alias("_r"),
    ).unionByName(
        left.select(
            F.col(on).alias("_k"),
            F.col(ts).alias("_ts"),
            F.col(idc).alias("_id"),
            F.lit(_LEFT).alias("_r"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    idc: str = "event_id",
    skewed: bool = False,
    bucket: str = "1 day",
) -> DataFrame:
    """Left as-of join: columns ``(_k, _ts, _id, asof_id, asof_ts)`` --
    one row per LEFT row, ``asof_*`` null when no right row precedes
    it.  ``bucket`` (skewed path only) is any Spark window duration;
    pick it so one key's rows per bucket fit a single task's sort
    comfortably (the result is bucket-invariant)."""
    u = _union_tagged(left, right, on, ts, idc)
    right_id = F.when(F.col("_r") == _RIGHT, F.col("_id"))
    right_ts = F.when(F.col("_r") == _RIGHT, F.col("_ts"))

    if not skewed:
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", F.desc("_r"), "_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            u.select(
                "_k",
                "_ts",
                "_id",
                "_r",
                F.last(right_id, ignorenulls=True).over(w).alias("asof_id"),
                F.last(right_ts, ignorenulls=True).over(w).alias("asof_ts"),
            )
            .filter(F.col("_r") == _LEFT)
            .drop("_r")
        )

    # --- time-bucketed salting ------------------------------------
    b = u.withColumn("_b", F.window("_ts", bucket)["start"])
    wb = (
        Window.partitionBy("_k", "_b")
        .orderBy("_ts", F.desc("_r"), "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.select(
        "_k",
        "_b",
        "_ts",
        "_id",
        "_r",
        F.last(right_id, ignorenulls=True).over(wb).alias("_win_id"),
        F.last(right_ts, ignorenulls=True).over(wb).alias("_win_ts"),
    ).filter(F.col("_r") == _LEFT)

    # Bucket summaries: one row per (key, bucket) present in EITHER
    # role (a left-only bucket still needs a carry-in), with the last
    # right row of the bucket (null if the bucket has none).  struct
    # max == (ts, id)-lexicographic max, and later buckets always hold
    # later ts, so the carried state is simply the last non-null
    # summary strictly before this bucket.
    summaries = b.groupBy("_k", "_b").agg(
        F.max(
            F.when(F.col("_r") == _RIGHT, F.struct("_ts", "_id"))
        ).alias("_last")
    )
    wc = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.select(
        "_k",
        "_b",
        F.last("_last", ignorenulls=True).over(wc).alias("_carry"),
    )

    return (
        within.join(carry, ["_k", "_b"])
        .select(
            "_k",
            "_ts",
            "_id",
            F.coalesce(F.col("_win_id"), F.col("_carry._id")).alias("asof_id"),
            F.coalesce(F.col("_win_ts"), F.col("_carry._ts")).alias("asof_ts"),
        )
    )
