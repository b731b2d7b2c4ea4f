"""Canonical schemas for the OSM document pipeline.

The reference's output model (SURVEY.md §1.2) is a schema-dynamic
MongoDB document: any tag key can become a field.  That open key space
is hostile to columnar storage, so the Spark model (SURVEY.md §1.3) is
a FIXED superset StructType:

* structural fields (`_id`, `doc_type`, `created`, `pos`, `node_refs`,
  `members`) as typed columns -- reference clean_and_write.py:230-260;
* a curated set of promoted typed columns for the keys the reference
  types (list/int/float examples);
* typed side-maps (`lists`, `ints`, `floats`, `bools`) for the full
  promoted key sets (clean_and_write.py:47-61,146-165);
* subdivided roots (`addr` fixed struct; the other SUBDIVIDE roots as
  ``subdocs: map<root, map<subpath, value>>`` -- lossless, prunable);
* `tags: map<string,string>` holding the raw long tail, so nothing the
  reference stores is lost.
"""

from __future__ import annotations

from pyspark.sql import types as T

CREATED_STRUCT = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("changeset", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("uid", T.StringType()),
    ]
)

MEMBER_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("ref", T.StringType()),
        T.StructField("role", T.StringType()),
    ]
)

# Fixed addr subkeys modeled as struct fields (the reference only nests
# addr keys with exactly one subkey, clean_and_write.py:319-328).
ADDR_FIELDS = (
    "street",
    "unit",
    "housename",
    "housenumber",
    "postcode",
    "city",
    "state",
    "country",
    "interpolation",
)

ADDR_STRUCT = T.StructType([T.StructField(f, T.StringType()) for f in ADDR_FIELDS])

# Raw pre-shape row: one per XML element, union of node/way/relation.
RAW_ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_type", T.StringType(), False),
        T.StructField("_id", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("created", CREATED_STRUCT),
        T.StructField("nds", T.ArrayType(T.StringType())),
        T.StructField("members", T.ArrayType(MEMBER_STRUCT)),
        T.StructField(
            "tags",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("k", T.StringType()),
                        T.StructField("v", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Canonical cleaned document.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("created", CREATED_STRUCT),
        T.StructField("pos", T.ArrayType(T.DoubleType())),
        T.StructField("node_refs", T.ArrayType(T.StringType())),
        T.StructField("members", T.ArrayType(MEMBER_STRUCT)),
        # Promoted columns (most-queried keys).
        T.StructField("name", T.ArrayType(T.StringType())),
        T.StructField("phone", T.ArrayType(T.StringType())),
        T.StructField("amenity", T.ArrayType(T.StringType())),
        T.StructField("shop", T.ArrayType(T.StringType())),
        T.StructField("is_in", T.ArrayType(T.StringType())),
        T.StructField("addr", ADDR_STRUCT),
        T.StructField("ele", T.LongType()),
        T.StructField("population", T.LongType()),
        T.StructField("lanes", T.LongType()),
        T.StructField("building_levels", T.DoubleType()),
        T.StructField("maxheight", T.DoubleType()),
        # Typed side-maps for the full promoted key sets.
        T.StructField("lists", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
        T.StructField("ints", T.MapType(T.StringType(), T.LongType())),
        T.StructField("floats", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("bools", T.MapType(T.StringType(), T.BooleanType())),
        # Subdivided roots other than addr: root -> (colon subpath -> value).
        T.StructField(
            "subdocs",
            T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType())),
        ),
        # Lossless long tail.
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)

REF_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("refers", T.ArrayType(T.StringType())),
    ]
)
