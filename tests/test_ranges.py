"""operators/ranges.range_join: the bucket-grid rewrite must equal the
naive non-equi join for ARBITRARY band edges -- including edges built
by approx_percentile, the engine-specific path an external oracle
cannot pin (rj1/rj2 pin ntile- and aggregate-derived edges via DuckDB;
this file closes the loop in-engine)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.ranges import (  # noqa: E402
    range_join,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _naive(probe, bands, value):
    return probe.join(
        bands, F.col(value).between(F.col("lo"), F.col("hi"))
    ).select(*probe.columns, *bands.columns)


def test_approx_percentile_edges_match_naive(spark):
    """Equi-depth-ish bands from approx_percentile: half-open
    [edge_i, edge_i+1) intervals closed up by a 0.005 shrink (values
    carry 2 decimals, so the shrink cannot cross a data value)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "value")
    probs = [i / 8 for i in range(9)]
    edges = ev.agg(
        F.percentile_approx("value", probs, 10_000).alias("e")
    ).collect()[0]["e"]
    bands = spark.createDataFrame(
        [
            (i, float(lo), float(hi) - (0.005 if i < len(edges) - 2 else 0.0))
            for i, (lo, hi) in enumerate(zip(edges, edges[1:]))
        ],
        "band int, lo double, hi double",
    )
    got = range_join(ev, bands, "value", n_buckets=64)
    assert _rows(got) == _rows(_naive(ev, bands, "value"))


def test_overlapping_and_outlier_bands(spark):
    """Bands that overlap each other, extend past the probe domain on
    both sides, or miss it entirely -- the clamped grid must stay
    covering and the residual exact."""
    probe = spark.range(200).select(
        F.col("id").alias("pid"), (F.col("id") / 10.0).alias("v")
    )
    bands = spark.createDataFrame(
        [
            (0, -100.0, 5.0),     # extends below the domain
            (1, 3.0, 12.0),       # overlaps band 0
            (2, 11.95, 11.95),    # point interval on a data value
            (3, 18.0, 1000.0),    # extends above the domain
            (4, 2000.0, 3000.0),  # entirely outside: matches nothing
        ],
        "band int, lo double, hi double",
    )
    got = range_join(probe, bands, "v", n_buckets=16)
    assert _rows(got) == _rows(_naive(probe, bands, "v"))
    assert got.filter(F.col("band") == 4).count() == 0


def test_degenerate_all_equal_probe(spark):
    """All-equal probe values: zero natural bucket width must degrade
    to bucket 0, not an ANSI division error."""
    probe = spark.range(50).select(F.lit(7.25).alias("v"))
    bands = spark.createDataFrame(
        [(0, 7.0, 7.5), (1, 8.0, 9.0)], "band int, lo double, hi double"
    )
    got = range_join(probe, bands, "v", n_buckets=8)
    assert got.count() == 50
    assert got.filter(F.col("band") == 1).count() == 0
