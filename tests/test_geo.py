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
