"""Oracle-gated geo indexing queries (reference M4, main.ipynb:1861-1862).

The geohash cell/encode operators (operators/geo.py) are pure
bit-arithmetic column expressions, so the DuckDB oracle re-implements
the identical interleave + base32 encode with integer shift/mask SQL
generated from the same Python loop -- a deviation in any bit breaks
the hash.  Runs over the node rows of the committed OSM raw fixture
(the only table with real lat/lon).

Scale note: the cell is a plain int64/string column -- groupBy cell is
one hash aggregation, and :func:`operators.geo.cluster_by_geo` aligns
parquet row-group min/max stats with it for scan-time pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.geo import geo_cell, geohash
from ..schema import RAW_ELEMENT_SCHEMA
from .queries import register
from .queries_etl import FIXTURE_PARQUET

_PRECISION = 5
_BITS = 5 * _PRECISION
_N_LON = (_BITS + 1) // 2
_N_LAT = _BITS // 2
_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _cell_sql(lat: str, lon: str) -> str:
    """The geo_cell bit interleave as DuckDB integer arithmetic,
    generated from the same loop as operators/geo.py geo_cell."""
    lon_q = (
        f"least(CAST(floor(({lon} + 180.0) / 360.0 * {float(1 << _N_LON)}) "
        f"AS BIGINT), {(1 << _N_LON) - 1})"
    )
    lat_q = (
        f"least(CAST(floor(({lat} + 90.0) / 180.0 * {float(1 << _N_LAT)}) "
        f"AS BIGINT), {(1 << _N_LAT) - 1})"
    )
    terms = []
    for i in range(_BITS):
        if i % 2 == 0:
            src, width, idx = "LON_Q", _N_LON, i // 2
        else:
            src, width, idx = "LAT_Q", _N_LAT, i // 2
        terms.append(
            f"((({src} >> {width - 1 - idx}) & 1) * {1 << (_BITS - 1 - i)})"
        )
    expr = " + ".join(terms)
    return (
        f"(SELECT {expr} FROM (SELECT {lon_q} AS LON_Q, {lat_q} AS LAT_Q) _q)"
    )


def _hash_sql(cell: str) -> str:
    """Base32 geohash string from the cell int (5 bits per char)."""
    chars = [
        f"substr('{_BASE32}', CAST((({cell}) >> {5 * (_PRECISION - 1 - c)}) "
        f"& 31 AS INT) + 1, 1)"
        for c in range(_PRECISION)
    ]
    return "(" + " || ".join(chars) + ")"


_GEO_ORACLE = f"""
WITH nodes AS (
  SELECT _id, lat, lon
  FROM read_parquet('{FIXTURE_PARQUET}')
  WHERE doc_type = 'node' AND lat IS NOT NULL AND lon IS NOT NULL
),
cells AS (
  SELECT _id, {_cell_sql('lat', 'lon')} AS cell FROM nodes
)
SELECT cell,
       {_hash_sql('cell')} AS cell_hash,
       count(*) AS n_nodes,
       min(_id) AS min_id
FROM cells
GROUP BY cell
"""


@register(
    "g1_geohash_cells",
    "Geohash cell aggregation over the OSM fixture's nodes: precision-5 "
    "interleaved cell id + base32 string, node count and min id per "
    "cell (reference M4 2d-index analog; operators/geo.py geo_cell / "
    "geohash, both re-derived bit-for-bit in the oracle).",
    _GEO_ORACLE,
    tags=("geo", "agg"),
)
def q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.schema(RAW_ELEMENT_SCHEMA).parquet(FIXTURE_PARQUET)
    nodes = raw.filter(
        (F.col("doc_type") == "node")
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
    )
    cells = nodes.select(
        "_id",
        geo_cell(F.col("lat"), F.col("lon"), _PRECISION).alias("cell"),
        geohash(F.col("lat"), F.col("lon"), _PRECISION).alias("cell_hash"),
    )
    return cells.groupBy("cell", "cell_hash").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("_id").alias("min_id"),
    )
