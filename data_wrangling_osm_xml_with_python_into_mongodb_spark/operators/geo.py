"""Geo indexing parity (reference M4, main.ipynb:1861-1862).

The reference creates a MongoDB ``2d`` index on ``pos`` and a sparse
descending index on ``name``.  Spark has no secondary indexes; the
scalable equivalents are *data layout*:

* a **geohash cell column** (computed here as native bit-arithmetic
  expressions -- no UDF) gives equality/prefix bucketing: two positions
  share a cell prefix iff they are near each other, so point/box
  lookups prune to a handful of cells;
* **range-partition + sort by the cell** (:func:`cluster_by_geo`)
  aligns parquet row-group min/max stats with geography, so a cell
  predicate skips almost every row group at scan time (the min-max
  analog of the reference's index scan);
* the ``name`` index analog is the same recipe on ``name`` --
  ``df.repartitionByRange('name').sortWithinPartitions('name')``.

Geohash standard: interleave longitude/latitude bisection bits
(longitude first), then base32-encode 5 bits per character.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geo_cell(lat: Column, lon: Column, precision: int = 5) -> Column:
    """Geohash cell of (lat, lon) as an int64 of ``5 * precision``
    interleaved bits (lon first, per the geohash spec).

    Quantizing the scaled fraction to ``ceil(bits/2)`` / ``floor(bits/2)``
    bits is exactly the iterative bisection the spec describes, unrolled
    into codegen-friendly shift/mask arithmetic.
    """
    bits = 5 * precision
    n_lon = (bits + 1) // 2
    n_lat = bits // 2
    lon_q = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << n_lon)))
    lat_q = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << n_lat)))
    # Clamp the degenerate upper edge (lat=90 / lon=180).
    lon_q = F.least(lon_q, F.lit((1 << n_lon) - 1)).cast("long")
    lat_q = F.least(lat_q, F.lit((1 << n_lat) - 1)).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Bit positions count from the most significant quantized bit.
        if i % 2 == 0:  # even slots: longitude
            src, width, idx = lon_q, n_lon, i // 2
        else:  # odd slots: latitude
            src, width, idx = lat_q, n_lat, i // 2
        bit = F.shiftright(src, width - 1 - idx).bitwiseAND(F.lit(1))
        z = z + (bit * F.lit(1 << (bits - 1 - i)))
    return z


def geohash(lat: Column, lon: Column, precision: int = 5) -> Column:
    """Standard base32 geohash string of length ``precision``."""
    z = geo_cell(lat, lon, precision)
    chars = [
        F.substring(
            F.lit(_BASE32),
            F.shiftright(z, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31)).cast("int")
            + F.lit(1),
            F.lit(1),
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def with_geo_cell(docs: DataFrame, precision: int = 5) -> DataFrame:
    """Add ``geo_cell``/``geohash`` columns from the document ``pos``
    array (null for ways/relations, like the reference's sparse index)."""
    lat = F.element_at("pos", 1)
    lon = F.element_at("pos", 2)
    has_pos = F.col("pos").isNotNull()
    return docs.withColumn(
        "geo_cell", F.when(has_pos, geo_cell(lat, lon, precision))
    ).withColumn("geohash", F.when(has_pos, geohash(lat, lon, precision)))


def cluster_by_geo(docs: DataFrame, precision: int = 5) -> DataFrame:
    """Layout for geo data skipping: range-partition and sort by the
    cell id so parquet min/max stats prune cell-predicate scans (the
    M4 ``2d``-index analog; write the result as the serving table)."""
    out = with_geo_cell(docs, precision)
    return out.repartitionByRange("geo_cell").sortWithinPartitions("geo_cell")


def cluster_by_name(
    df: DataFrame, name_col: str = "name", num_partitions: int | None = None
) -> DataFrame:
    """The reference's sparse DESCENDING ``name`` index
    (main.ipynb:1861 ``create_index([('name', DESCENDING)], sparse=True)``)
    as data layout: range-partition on the name key descending with
    nulls last, sorted within partitions, so each written file's
    parquet min/max covers a disjoint name range and a name predicate
    prunes to one file / row group at scan time (asserted from the
    parquet footers in tests/test_geo.py).

    * DESCENDING -> ``desc_nulls_last`` ordering, so the "front" of
      the layout is the tail of the alphabet, like the index scan
      order.
    * sparse -> unnamed documents (null key) all land in the final
      partition; a non-null name predicate never touches it -- the
      layout analog of not being in the index at all.
    * DOCUMENT_SCHEMA's ``name`` is the promoted list column; min/max
      stats need a primitive leaf, so its first entry is materialized
      as a ``name_key`` column that rides into the written table (the
      pruning predicate targets it).  Scalar name columns are used
      directly, no extra column.
    """
    key_name = name_col
    out = df
    if dict(df.dtypes).get(name_col, "").startswith("array"):
        key_name = "name_key"
        out = df.withColumn(key_name, F.element_at(F.col(name_col), 1))
    parts = [num_partitions] if num_partitions is not None else []
    order = F.col(key_name).desc_nulls_last()
    return out.repartitionByRange(*parts, order).sortWithinPartitions(order)
