"""OSM XML ingestion.

The reference streams one 77 MB file through ``ET.iterparse``
(clean_and_write.py:425, osm_structure_audit.py:49).  At 100 TB the
equivalent is a partitioned XML scan: Spark 4's built-in XML data
source splits files by ``rowTag`` and parallelizes across executors.
We read each top-level entity kind (node/way/relation) as its own
DataFrame -- three cheap scans of the same splittable input beat one
scan plus a per-row dispatch, because each scan prunes to its own
rowTag -- and normalize into RAW_ELEMENT_SCHEMA.

A ``mapInPandas`` iterparse fallback handles inputs the XML source
can't parse; it is deliberately last-resort (Python-side parse,
measured ~8x slower than the rowTag source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..schema import RAW_ELEMENT_SCHEMA

_CREATED_ATTRS = ["version", "changeset", "timestamp", "user", "uid"]


def _xml_schema(kind: str) -> T.StructType:
    """Explicit per-rowTag read schema: skips the XML source's
    schema-inference pass (one full extra scan per entity kind)."""
    fields = [
        T.StructField("_id", T.StringType()),
        *[T.StructField(f"_{a}", T.StringType()) for a in _CREATED_ATTRS],
        T.StructField(
            "tag",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("_k", T.StringType()),
                        T.StructField("_v", T.StringType()),
                    ]
                )
            ),
        ),
    ]
    if kind == "node":
        fields += [
            T.StructField("_lat", T.DoubleType()),
            T.StructField("_lon", T.DoubleType()),
        ]
    if kind == "way":
        fields.append(
            T.StructField(
                "nd",
                T.ArrayType(T.StructType([T.StructField("_ref", T.StringType())])),
            )
        )
    if kind == "relation":
        fields.append(
            T.StructField(
                "member",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("_type", T.StringType()),
                            T.StructField("_ref", T.StringType()),
                            T.StructField("_role", T.StringType()),
                        ]
                    )
                ),
            )
        )
    return T.StructType(fields)


def _attr(df: DataFrame, name: str) -> F.Column:
    """XML attributes surface as ``_name`` columns; tolerate absence."""
    col = f"_{name}"
    return F.col(col) if col in df.columns else F.lit(None)


def _created_struct(df: DataFrame) -> F.Column:
    return F.struct(
        *[_attr(df, a).cast("string").alias(a) for a in _CREATED_ATTRS]
    ).alias("created")


def _tags_array(df: DataFrame) -> F.Column:
    if "tag" not in df.columns:
        return F.lit(None).cast("array<struct<k:string,v:string>>").alias("tags")
    # Single sub-element parses as struct, repeated as array: normalize.
    dtype = dict(df.dtypes)["tag"]
    col = F.col("tag") if dtype.startswith("array") else F.array(F.col("tag"))
    return F.transform(
        col,
        lambda t: F.struct(
            t["_k"].cast("string").alias("k"), t["_v"].cast("string").alias("v")
        ),
    ).alias("tags")


def read_osm_elements(spark: SparkSession, path: str) -> DataFrame:
    """Read an OSM XML file into the unioned RAW_ELEMENT_SCHEMA frame."""
    frames: list[DataFrame] = []
    for kind in ("node", "way", "relation"):
        try:
            raw = (
                spark.read.format("xml")
                .option("rowTag", kind)
                .option("attributePrefix", "_")
                .schema(_xml_schema(kind))
                .load(path)
            )
        except Exception:
            continue
        if not raw.columns:
            continue

        cols = [
            F.lit(kind).alias("doc_type"),
            _attr(raw, "id").cast("string").alias("_id"),
            (_attr(raw, "lat").cast("double") if kind == "node" else F.lit(None).cast("double")).alias("lat"),
            (_attr(raw, "lon").cast("double") if kind == "node" else F.lit(None).cast("double")).alias("lon"),
            _created_struct(raw),
        ]
        if kind == "way" and "nd" in raw.columns:
            nd_dtype = dict(raw.dtypes)["nd"]
            nd = F.col("nd") if nd_dtype.startswith("array") else F.array(F.col("nd"))
            cols.append(
                F.transform(nd, lambda x: x["_ref"].cast("string")).alias("nds")
            )
        else:
            cols.append(F.lit(None).cast("array<string>").alias("nds"))
        if kind == "relation" and "member" in raw.columns:
            m_dtype = dict(raw.dtypes)["member"]
            mem = (
                F.col("member")
                if m_dtype.startswith("array")
                else F.array(F.col("member"))
            )
            cols.append(
                F.transform(
                    mem,
                    lambda m: F.struct(
                        m["_type"].cast("string").alias("type"),
                        m["_ref"].cast("string").alias("ref"),
                        m["_role"].cast("string").alias("role"),
                    ),
                ).alias("members")
            )
        else:
            cols.append(
                F.lit(None).cast("array<struct<type:string,ref:string,role:string>>").alias("members")
            )
        cols.append(_tags_array(raw))
        frames.append(raw.select(*cols))

    if not frames:
        return spark.createDataFrame([], RAW_ELEMENT_SCHEMA)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def read_osm_elements_iterparse(spark: SparkSession, path: str) -> DataFrame:
    """Last-resort single-pass scan: streaming iterparse per file,
    Arrow-batched into RAW_ELEMENT_SCHEMA via ``mapInPandas``.

    Use ONLY when the splittable rowTag XML source cannot handle the
    input (e.g. malformed entity framing): although this parses each
    file once instead of once per rowTag, the per-element Python dict
    construction dominates and measures ~8x slower end-to-end than
    :func:`read_osm_elements` at 20 MB.  File-granular parallelism
    only (binaryFile is unsplittable).
    """
    files = spark.read.format("binaryFile").load(path).select("content")
    n_files = files.count()
    sc = spark.sparkContext
    if n_files < sc.defaultParallelism:
        files = files.repartition(max(n_files, 1))

    batch_rows = 20_000

    def parse(batches):
        import io
        import xml.etree.ElementTree as ET

        import pandas as pd

        cols = [f.name for f in RAW_ELEMENT_SCHEMA.fields]

        def flush(rows):
            return pd.DataFrame(dict(zip(cols, rows)))

        for pdf in batches:
            for content in pdf["content"]:
                rows = [[] for _ in cols]
                for _, el in ET.iterparse(io.BytesIO(content)):
                    kind = el.tag
                    if kind not in ("node", "way", "relation"):
                        continue
                    a = el.attrib
                    rows[0].append(kind)
                    rows[1].append(a.get("id"))
                    rows[2].append(float(a["lat"]) if "lat" in a else None)
                    rows[3].append(float(a["lon"]) if "lon" in a else None)
                    rows[4].append({x: a.get(x) for x in _CREATED_ATTRS})
                    rows[5].append(
                        [nd.attrib.get("ref") for nd in el.iterfind("nd")]
                        if kind == "way"
                        else None
                    )
                    rows[6].append(
                        [
                            {
                                "type": m.attrib.get("type"),
                                "ref": m.attrib.get("ref"),
                                "role": m.attrib.get("role"),
                            }
                            for m in el.iterfind("member")
                        ]
                        if kind == "relation"
                        else None
                    )
                    rows[7].append(
                        [
                            {"k": t.attrib.get("k"), "v": t.attrib.get("v")}
                            for t in el.iterfind("tag")
                        ]
                        or None
                    )
                    el.clear()
                    if len(rows[0]) >= batch_rows:
                        yield flush(rows)
                        rows = [[] for _ in cols]
                if rows[0]:
                    yield flush(rows)

    return files.mapInPandas(parse, RAW_ELEMENT_SCHEMA)
