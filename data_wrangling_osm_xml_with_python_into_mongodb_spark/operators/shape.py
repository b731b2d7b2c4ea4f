"""Document shaping: raw XML elements -> canonical cleaned documents.

This is the Spark-native re-expression of the reference's ETL core
``shape_element`` (clean_and_write.py:230-381): one narrow ``select``
of pure column expressions -- no shuffle, no Python in the row path,
whole-stage-codegen'd end to end.  At 100 TB this pipeline is
embarrassingly parallel: cost scales linearly with input splits.

Mapping of the reference's per-element steps:

* attribute routing (clean_and_write.py:240-254)  -> structural columns
* problem-char tag drop (:14,283)                  -> ``filter`` on the tag array
* key rewrites (:15,42-45,285-299)                 -> ``rewrite_key`` per entry
* per-key value edits (:195-227)                   -> ``misc_val_edits``
* list keys (:146-179), phone (:97-111)            -> promoted list columns + ``lists`` map
* int/float promotion (:51-58,218-226)             -> ``ints``/``floats`` maps + columns
* bool tags (:47-48,182-192)                       -> ``bools`` map
* subdivided roots (:60-61,128-143,309-332)        -> ``addr`` struct + ``subdocs`` map
* nd dedup + sort (:258,271-272,346-347)           -> ``array_sort(array_distinct(...))``
* validation invariants (:358-379)                 -> :func:`validate_documents`
* ref_docs materialization (mongo_audit.py:271-329)-> :func:`build_ref_docs`
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import cleaning as C
from ..schema import ADDR_FIELDS

def _cleaned_tags() -> Column:
    """Tag array after problem-char drop, key rewrite, and value edits."""
    empty = F.expr("array()").cast("array<struct<k:string,v:string>>")
    tags = F.coalesce(F.col("tags"), empty)
    kept = F.filter(tags, lambda t: ~C.has_problem_chars(t["k"]))
    rewritten = F.transform(
        kept,
        lambda t: F.struct(C.rewrite_key(t["k"]).alias("k"), t["v"].alias("v")),
    )
    return F.transform(
        rewritten,
        lambda t: F.struct(
            t["k"].alias("k"), C.misc_val_edits(t["k"], t["v"]).alias("v")
        ),
    )


def clean_elements(raw: DataFrame) -> DataFrame:
    """Phase 1: structural columns + the cleaned tag array, computed
    ONCE per row in a single narrow projection.

    Split from :func:`shape_documents` because the shaping phase reads
    the cleaned array ~25 times (one per promoted column); if cleaning
    were inlined there, Catalyst's project-collapse would duplicate the
    whole interpreted higher-order cleaning tree per reference -- a
    measured ~25x slowdown.  Reading a *stored column* 25 times is
    free, so the pipeline materializes this boundary (bronze table in
    production; ``localCheckpoint`` for in-session use)."""
    return raw.select(
        "doc_type",
        "_id",
        "lat",
        "lon",
        "created",
        "nds",
        "members",
        _cleaned_tags().alias("ctags"),
    )


def _tag_val(tags: Column, key: str) -> Column:
    hits = F.filter(tags, lambda t: t["k"] == key)
    return F.get(hits, 0)["v"]


def _entries(tags: Column, pred, val) -> Column:
    """map_from_entries over the tag subset matching ``pred``, with
    values transformed by ``val(k, v)``."""
    subset = F.filter(tags, pred)
    return F.map_from_entries(
        F.transform(subset, lambda t: F.struct(t["k"], val(t["k"], t["v"])))
    )


def _phone_list(v: Column) -> Column:
    """Semicolon-split then per-element phone normalization
    (clean_and_write.py:300-305 list-ify, then :97-111 per element)."""
    return F.transform(C.split_list_value(v), lambda p: C.format_phone(p))


def shape_documents(raw: DataFrame, materialize: bool = True) -> DataFrame:
    """RAW_ELEMENT_SCHEMA -> DOCUMENT_SCHEMA.

    Two-phase: :func:`clean_elements` (clean once) then the shaping
    projection off the stored ``ctags`` column.  ``materialize=True``
    pins the phase boundary with a lazy ``localCheckpoint`` so the
    optimizer cannot collapse the projections and re-inline the
    cleaning tree per promoted column (production pipelines write the
    phase-1 frame as a bronze table instead -- sources/sinks.py)."""
    if materialize:
        # A single small XML file parses as one split; spread the
        # (expensive) cleaning + shaping across cores.  The
        # repartition shuffle moves raw-sized rows once -- cheap
        # relative to the expression work it parallelizes; a many-file
        # 100 TB input already yields enough splits to skip this.
        sc = raw.sparkSession.sparkContext
        raw = raw.repartition(sc.defaultParallelism)
    cleaned = clean_elements(raw)
    if materialize:
        # EAGER checkpoint: the lazy variant keeps the analyzed plan,
        # letting project-collapse re-inline the cleaning tree into
        # every promoted-column reference (measured ~20x slower).
        # Eager materialization pins phase 1 as a LogicalRDD, so the
        # shaping projection reads stored columns.
        cleaned = cleaned.localCheckpoint(eager=True)
    return shape_from_clean(cleaned)


def shape_from_clean(cleaned: DataFrame) -> DataFrame:
    """Phase 2: the shaping projection off a stored ``ctags`` column
    (the :func:`clean_elements` output, typically a bronze table)."""
    tags = F.col("ctags")
    subdiv_no_addr = [r for r in C.SUBDIVIDE_LST if r != "addr"]

    root = lambda t: F.split(t["k"], ":").getItem(0)  # noqa: E731
    has_colon = lambda t: t["k"].contains(":")  # noqa: E731

    addr_sub = lambda f: _tag_val(tags, f"addr:{f}")
    addr_struct = F.struct(
        *[
            C.clean_addr_value(F.lit(f), addr_sub(f)).alias(f)
            for f in ADDR_FIELDS
        ]
    )
    # Null out the struct when no addr:* key exists at all.
    any_addr = F.exists(tags, lambda t: t["k"].startswith("addr:"))
    addr_struct = F.when(any_addr, addr_struct).otherwise(
        F.lit(None).cast(
            "struct<" + ",".join(f"{f}:string" for f in ADDR_FIELDS) + ">"
        )
    )

    def promoted_list(key: str) -> Column:
        v = _tag_val(tags, key)
        if key == "phone":
            out = _phone_list(v)
        elif key == "is_in":
            out = C.isin_set(v)
        else:
            out = C.split_list_value(v)
        return F.when(v.isNotNull(), out).otherwise(
            F.lit(None).cast("array<string>")
        )

    # subdocs: colon-keyed entries under the non-addr SUBDIVIDE roots,
    # root -> map(subpath -> value). Reference subdiv_key recursion
    # (clean_and_write.py:128-143) flattened to path-keyed maps --
    # same information, columnar-friendly.
    sub_tags = F.filter(
        tags, lambda t: has_colon(t) & root(t).isin(*subdiv_no_addr)
    )
    sub_roots = F.array_distinct(F.transform(sub_tags, root))
    subdocs = F.map_from_entries(
        F.transform(
            sub_roots,
            lambda r: F.struct(
                r,
                F.map_from_entries(
                    F.transform(
                        F.filter(sub_tags, lambda t: root(t) == r),
                        lambda t: F.struct(
                            F.regexp_replace(t["k"], r"^[^:]*:", "").alias("k"),
                            t["v"].alias("v"),
                        ),
                    )
                ),
            ),
        )
    )
    subdocs = F.when(F.size(sub_tags) > 0, subdocs).otherwise(
        F.lit(None).cast("map<string,map<string,string>>")
    )

    is_bool_tag = lambda t: root(t).isin(*C.BOOL_TAGS_LST) & has_colon(t)  # noqa: E731

    doc = cleaned.select(
        F.col("_id"),
        F.col("doc_type"),
        F.col("created"),
        F.when(
            F.col("doc_type") == "node", F.array(F.col("lat"), F.col("lon"))
        )
        .otherwise(F.lit(None).cast("array<double>"))
        .alias("pos"),
        F.when(
            F.col("doc_type") == "way",
            F.array_sort(F.array_distinct(F.col("nds"))),
        )
        .otherwise(F.lit(None).cast("array<string>"))
        .alias("node_refs"),
        F.when(F.col("doc_type") == "relation", F.col("members"))
        .otherwise(F.lit(None).cast("array<struct<type:string,ref:string,role:string>>"))
        .alias("members"),
        promoted_list("name").alias("name"),
        promoted_list("phone").alias("phone"),
        promoted_list("amenity").alias("amenity"),
        promoted_list("shop").alias("shop"),
        promoted_list("is_in").alias("is_in"),
        addr_struct.alias("addr"),
        C.to_int_value(F.lit("ele"), _tag_val(tags, "ele")).alias("ele"),
        C.to_int_value(F.lit("population"), _tag_val(tags, "population")).alias(
            "population"
        ),
        C.to_int_value(F.lit("lanes"), _tag_val(tags, "lanes")).alias("lanes"),
        C.to_float_value(
            F.lit("building:levels"), _tag_val(tags, "building:levels")
        ).alias("building_levels"),
        C.to_float_value(F.lit("maxheight"), _tag_val(tags, "maxheight")).alias(
            "maxheight"
        ),
        _entries(
            tags,
            lambda t: t["k"].isin(*C.LIST_KEYS),
            lambda k, v: F.when(k == "phone", _phone_list(v)).otherwise(
                C.split_list_value(v)
            ),
        ).alias("lists"),
        _entries(
            tags,
            lambda t: t["k"].isin(*C.TO_INT_LST),
            lambda k, v: C.to_int_value(k, v),
        ).alias("ints"),
        _entries(
            tags,
            lambda t: t["k"].isin(*C.TO_FLOAT_LST),
            lambda k, v: C.to_float_value(k, v),
        ).alias("floats"),
        _entries(tags, is_bool_tag, lambda k, v: C.to_bool_or_null(v)).alias(
            "bools"
        ),
        subdocs.alias("subdocs"),
        # Lossless long tail: every cleaned tag, raw string value.
        F.map_from_entries(
            F.transform(tags, lambda t: F.struct(t["k"], t["v"]))
        ).alias("tags"),
    )
    return doc


def validate_documents(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Document-kind invariants (clean_and_write.py:358-379) as a
    filter pair: (valid, quarantine).  The reference prints violations;
    at scale a quarantine table is the auditable equivalent."""
    is_node = (
        (F.col("doc_type") == "node")
        & F.col("pos").isNotNull()
        & (F.size("pos") == 2)
        & F.col("node_refs").isNull()
        & F.col("members").isNull()
    )
    is_way = (
        (F.col("doc_type") == "way")
        & F.col("node_refs").isNotNull()
        & F.col("pos").isNull()
        & F.col("members").isNull()
    )
    is_rel = (
        (F.col("doc_type") == "relation")
        & F.col("members").isNotNull()
        & F.col("pos").isNull()
        & F.col("node_refs").isNull()
    )
    ok = is_node | is_way | is_rel
    return docs.filter(ok), docs.filter(~ok)


def build_ref_docs(docs: DataFrame) -> DataFrame:
    """The inverted reference index (mongo_audit.py:271-329): for every
    referenced id, the sorted list of referencing document ids.

    Scale: explode is narrow; the single shuffle is the groupBy on the
    referenced id.  Per-key fanout is bounded by real-world node reuse;
    AQE skew-join/partition handling covers hot keys."""
    way_refs = docs.select(
        F.col("_id").alias("src_id"), F.explode_outer("node_refs").alias("ref")
    )
    rel_refs = docs.select(
        F.col("_id").alias("src_id"),
        F.explode_outer(F.col("members")["ref"]).alias("ref"),
    )
    return (
        way_refs.unionByName(rel_refs)
        .filter(F.col("ref").isNotNull())
        .groupBy("ref")
        .agg(F.array_sort(F.collect_list("src_id")).alias("refers"))
        .select(F.col("ref").alias("_id"), "refers")
    )
