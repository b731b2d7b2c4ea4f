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


_G2_R = 0.01  # radius in coordinate degrees (fixture spans ~0.2 x 0.2)


@register(
    "g2_radius_join_grid",
    "Spatial radius join via grid-cell bucketing: for each of the 5 "
    "lowest-id nodes, every other node within 0.01 deg -- query points "
    "explode onto their 3x3 neighbor cells (cell size = radius, so the "
    "neighborhood provably covers the circle), equi-join on cell, "
    "exact squared-distance residual.  The oracle is the naive "
    "all-pairs join, so the bucketing must be lossless; distance "
    "arithmetic is multiplication-only (no trig), which both engines "
    "evaluate bit-identically.",
    f"""
    WITH nodes AS (
      SELECT _id, lat, lon
      FROM read_parquet('{FIXTURE_PARQUET}')
      WHERE doc_type = 'node' AND lat IS NOT NULL AND lon IS NOT NULL
    ),
    q AS (
      SELECT _id AS qid, lat AS qlat, lon AS qlon
      FROM nodes ORDER BY _id LIMIT 5
    ),
    pairs AS (
      SELECT q.qid, n._id,
             (n.lat - q.qlat) * (n.lat - q.qlat)
             + (n.lon - q.qlon) * (n.lon - q.qlon) AS d2
      FROM q JOIN nodes n ON n._id <> q.qid
      WHERE (n.lat - q.qlat) * (n.lat - q.qlat)
            + (n.lon - q.qlon) * (n.lon - q.qlon) <= {_G2_R} * {_G2_R}
    ),
    ranked AS (
      SELECT qid, _id, d2,
             row_number() OVER (PARTITION BY qid ORDER BY d2, _id) AS rn
      FROM pairs
    )
    SELECT c.qid, c.n_within, r._id AS nearest_id,
           round(sqrt(r.d2), 6) AS min_dist
    FROM (SELECT qid, count(*) AS n_within FROM pairs GROUP BY qid) c
    JOIN ranked r ON r.qid = c.qid AND r.rn = 1
    """,
    tags=("geo", "join", "range"),
)
def q_radius_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2D sibling of rj1's bucket-grid rewrite: a naive radius
    join compares every point against every query (a cross join); the
    grid form compares each point only against queries sharing one of
    its 3x3 cells.  At planet scale with millions of query points the
    SAME plan holds -- both sides bucket to cells, the join is
    shuffle-equi on the cell id, and each circle's candidate set is
    O(density x 9 cells).  sqrt is IEEE-correctly-rounded, so the
    rounded distance is engine-portable."""
    raw = spark.read.schema(RAW_ELEMENT_SCHEMA).parquet(FIXTURE_PARQUET)
    nodes = raw.filter(
        (F.col("doc_type") == "node")
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
    ).select("_id", "lat", "lon")
    r = F.lit(_G2_R)
    qpts = (
        nodes.orderBy("_id")
        .limit(5)
        .select(
            F.col("_id").alias("qid"),
            F.col("lat").alias("qlat"),
            F.col("lon").alias("qlon"),
        )
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    qgrid = (
        qpts.select("*", off.alias("dx"))
        .select("*", off.alias("dy"))
        .select(
            "qid",
            "qlat",
            "qlon",
            (F.floor(F.col("qlon") / r) + F.col("dx")).alias("cx"),
            (F.floor(F.col("qlat") / r) + F.col("dy")).alias("cy"),
        )
    )
    cand = nodes.select(
        "_id",
        "lat",
        "lon",
        F.floor(F.col("lon") / r).alias("cx"),
        F.floor(F.col("lat") / r).alias("cy"),
    )
    d2 = (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat")) + (
        F.col("lon") - F.col("qlon")
    ) * (F.col("lon") - F.col("qlon"))
    pairs = (
        cand.join(F.broadcast(qgrid), ["cx", "cy"])
        .filter((F.col("_id") != F.col("qid")) & (d2 <= r * r))
        .select("qid", "_id", d2.alias("d2"))
    )
    return (
        pairs.groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min(F.struct("d2", "_id")).alias("_near"),
        )
        .select(
            "qid",
            "n_within",
            F.col("_near._id").alias("nearest_id"),
            F.round(F.sqrt(F.col("_near.d2")), 6).alias("min_dist"),
        )
    )


_G3_CELL = 0.01  # kNN grid cell size (deg)
_G3_K = 5


@register(
    "g3_knn_grid",
    "Grid-bucketed k-nearest-neighbors: the 5 nearest nodes to each "
    "of the 5 lowest-id query nodes, candidates drawn ONLY from the "
    "query's 3x3 grid neighborhood (cell 0.01 deg), ranked by exact "
    "squared distance with id tiebreak.  The oracle is brute-force "
    "all-pairs kNN, so the gate itself proves the grid search is "
    "lossless here: the kth distance (max 0.0015 on this corpus) is "
    "under the cell size, the provable-coverage condition that rides "
    "along as the in_proof column on both sides.",
    f"""
    WITH nodes AS (
      SELECT _id, lat, lon
      FROM read_parquet('{FIXTURE_PARQUET}')
      WHERE doc_type = 'node' AND lat IS NOT NULL AND lon IS NOT NULL
    ),
    q AS (
      SELECT _id AS qid, lat AS qlat, lon AS qlon
      FROM nodes ORDER BY _id LIMIT 5
    ),
    pairs AS (
      SELECT q.qid, n._id,
             (n.lat - q.qlat) * (n.lat - q.qlat)
             + (n.lon - q.qlon) * (n.lon - q.qlon) AS d2
      FROM q JOIN nodes n ON n._id <> q.qid
    ),
    ranked AS (
      SELECT qid, _id, d2,
             row_number() OVER (PARTITION BY qid ORDER BY d2, _id) AS rn
      FROM pairs
    )
    SELECT qid, CAST(rn AS INT) AS rn, _id AS nn_id,
           round(sqrt(d2), 6) AS dist,
           sqrt(d2) <= {_G3_CELL} AS in_proof
    FROM ranked WHERE rn <= {_G3_K}
    """,
    tags=("geo", "join", "search"),
)
def q_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN as a bounded radius join: candidates equi-join on grid
    cell (the g2 3x3 bucketing with cell = 0.01), then a per-query
    window takes the k best -- the window partitions on qid over
    candidate sets of O(density x 9 cells), never the corpus.  At
    planet scale this is the standard two-phase kNN: grid prune, then
    local top-k; the coverage condition (kth distance <= cell) is
    what makes the prune exact, and the oracle's brute-force twin
    fails the hash if it ever stops holding."""
    from pyspark.sql import Window

    raw = spark.read.schema(RAW_ELEMENT_SCHEMA).parquet(FIXTURE_PARQUET)
    nodes = raw.filter(
        (F.col("doc_type") == "node")
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
    ).select("_id", "lat", "lon")
    cell = F.lit(_G3_CELL)
    qpts = (
        nodes.orderBy("_id")
        .limit(5)
        .select(
            F.col("_id").alias("qid"),
            F.col("lat").alias("qlat"),
            F.col("lon").alias("qlon"),
        )
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    qgrid = (
        qpts.select("*", off.alias("dx"))
        .select("*", off.alias("dy"))
        .select(
            "qid",
            "qlat",
            "qlon",
            (F.floor(F.col("qlon") / cell) + F.col("dx")).alias("cx"),
            (F.floor(F.col("qlat") / cell) + F.col("dy")).alias("cy"),
        )
    )
    cand = nodes.select(
        "_id",
        "lat",
        "lon",
        F.floor(F.col("lon") / cell).alias("cx"),
        F.floor(F.col("lat") / cell).alias("cy"),
    )
    d2 = (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat")) + (
        F.col("lon") - F.col("qlon")
    ) * (F.col("lon") - F.col("qlon"))
    pairs = (
        cand.join(F.broadcast(qgrid), ["cx", "cy"])
        .filter(F.col("_id") != F.col("qid"))
        .select("qid", "_id", d2.alias("d2"))
    )
    w = Window.partitionBy("qid").orderBy("d2", "_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _G3_K)
        .select(
            "qid",
            F.col("rn").cast("int").alias("rn"),
            F.col("_id").alias("nn_id"),
            F.round(F.sqrt("d2"), 6).alias("dist"),
            (F.sqrt("d2") <= _G3_CELL).alias("in_proof"),
        )
    )
