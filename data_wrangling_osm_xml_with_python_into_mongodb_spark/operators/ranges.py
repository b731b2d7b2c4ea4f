"""Range (interval) join -- the non-equi join Spark has no native
operator for (reference has no counterpart; SURVEY.md extension
surface).

A naive ``probe JOIN bands ON value BETWEEN lo AND hi`` plans as a
BroadcastNestedLoopJoin: O(rows x bands) compares with no partition
parallelism on the compare loop.  The production rewrite here makes it
an EQUI-join on a fixed bucket grid:

1. one exact aggregate over the probe computes (min, bucket width) --
   no sort, AQE-splittable, and the epsilon floor keeps degenerate
   (all-equal) input alive under ANSI division;
2. each band row is exploded onto every grid bucket its ``[lo, hi]``
   overlaps (monotone floor arithmetic, so coverage is exact: a value
   and any band containing it always share the value's bucket);
3. hash equi-join on bucket (the band side is dim-sized -> broadcast),
   with the original BETWEEN kept as a residual filter.

Each probe row meets only the bands sharing its bucket (~overlap
factor), not all of them.  The rewrite is lossless for ARBITRARY band
edges -- equi-depth ntile edges (rj1), exact aggregate edges (rj2), or
approx_percentile edges (tests/test_ranges.py) all produce the same
join result as the naive formulation by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    probe: DataFrame,
    bands: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    n_buckets: int = 256,
) -> DataFrame:
    """Inner range join: every probe row paired with every band row
    whose ``[lo, hi]`` contains ``probe[value]``.  Returns probe
    columns + band columns.  ``bands`` must be dim-sized (it is
    broadcast, once raw for the grid build and once exploded ~overlap
    x n_buckets/bands rows for the join)."""
    stats = probe.agg(
        F.min(value).alias("_mn"),
        F.greatest(
            (F.max(value) - F.min(value)) / n_buckets, F.lit(1e-12)
        ).alias("_w"),
    )

    def bucket(col):
        return F.greatest(
            F.lit(0),
            F.least(
                F.floor((col - F.col("_mn")) / F.col("_w")),
                F.lit(n_buckets - 1),
            ),
        )

    bands_b = (
        bands.crossJoin(F.broadcast(stats))
        .select(
            *bands.columns,
            F.explode(
                F.sequence(bucket(F.col(lo)), bucket(F.col(hi)))
            ).alias("_bucket"),
        )
    )
    probe_b = probe.crossJoin(F.broadcast(stats)).select(
        *probe.columns, bucket(F.col(value)).alias("_bucket")
    )
    return (
        probe_b.join(F.broadcast(bands_b), "_bucket")
        .filter(F.col(value).between(F.col(lo), F.col(hi)))
        .drop("_bucket")
    )
