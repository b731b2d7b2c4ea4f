"""The reference's query/audit layer (mongo_audit.py) over the
canonical document frame: each PyMongo aggregation pipeline becomes a
declarative DataFrame chain.

Every function takes the shaped documents DataFrame (operators/shape.py)
and returns a DataFrame; nothing collects driver-side.  The client-side
foreach-update loops of the reference (mongo_audit.py:247-267) become
single distributed transforms.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def count_unique_users(docs: DataFrame) -> DataFrame:
    """Distinct contributing users (mongo_audit.py:7-12, A1)."""
    return docs.agg(F.countDistinct("created.uid").alias("unique_users"))


def count_docs_by(docs: DataFrame, group_key: str, doc_type: str | None = None) -> DataFrame:
    """Filtered group-by count (mongo_audit.py:46-62, A3)."""
    out = docs
    if doc_type is not None:
        out = out.filter(F.col("doc_type") == doc_type)
    return (
        out.filter(F.col(group_key).isNotNull())
        .groupBy(group_key)
        .agg(F.count(F.lit(1)).alias("count"))
    )


def check_doc_counts_by(docs: DataFrame, group_key: str) -> DataFrame:
    """The reference loops per doc_type and concatenates
    (mongo_audit.py:65-81, A4); one two-key grouped agg replaces it."""
    return (
        docs.filter(F.col(group_key).isNotNull())
        .groupBy("doc_type", group_key)
        .agg(F.count(F.lit(1)).alias("count"))
    )


def audit_referenced_types(docs: DataFrame) -> DataFrame:
    """Which doc types do ways' node_refs resolve to?
    (mongo_audit.py:109-144, J3+A5: $lookup + $match refs != [] +
    $addToSet).  Expected invariant: ways reference only nodes.

    Scale: the exploded ref stream joins docs on _id -- a shuffle
    equi-join on the id; the result aggregates to one row per way
    doc_type, so the final agg is tiny."""
    refs = docs.filter(F.col("doc_type") == "way").select(
        F.explode("node_refs").alias("ref")
    )
    targets = docs.select(F.col("_id").alias("ref"), F.col("doc_type").alias("ref_type"))
    return (
        refs.join(targets, "ref", "inner")
        .agg(F.sort_array(F.collect_set("ref_type")).alias("type"))
    )


def find_mismatched_members(docs: DataFrame) -> DataFrame:
    """Relations whose member.type disagrees with the referenced
    document's actual doc_type (mongo_audit.py:163-226, J2+P8):
    unwind members, inner-join on ref, compare."""
    mem = docs.filter(F.col("doc_type") == "relation").select(
        F.col("_id").alias("rel_id"), F.explode("members").alias("m")
    )
    targets = docs.select(
        F.col("_id").alias("ref_id"), F.col("doc_type").alias("actual_type")
    )
    return (
        mem.join(targets, mem["m.ref"] == targets["ref_id"], "inner")
        .filter(F.col("m.type") != F.col("actual_type"))
        .select(
            "rel_id",
            F.col("m.ref").alias("ref"),
            F.col("m.type").alias("claimed_type"),
            "actual_type",
            F.col("m.role").alias("role"),
        )
    )


def fix_mismatched_members(docs: DataFrame) -> DataFrame:
    """Repair member.type to the referenced doc's actual type
    (mongo_audit.py:235-268, M2+P9).  The reference loops
    find_one_and_update per doc with a positional ``members.$`` update;
    here one ``transform`` over the array rewrites every mismatch in a
    single distributed pass.

    Implementation: build the correction map ref_id -> actual_type,
    broadcast-join it as a map column, rewrite inside ``transform``."""
    corrections = (
        find_mismatched_members(docs)
        .select("rel_id", "ref", "actual_type")
        .groupBy("rel_id")
        .agg(
            # array_distinct: a relation listing the same ref twice
            # yields two identical (ref, actual_type) entries; dedup
            # before map_from_entries so the build is policy-neutral.
            F.map_from_entries(
                F.array_distinct(F.collect_list(F.struct("ref", "actual_type")))
            ).alias("fixes")
        )
    )
    joined = docs.join(F.broadcast(corrections), docs["_id"] == corrections["rel_id"], "left")
    fixed_members = F.transform(
        F.col("members"),
        lambda m: F.when(
            F.col("fixes").isNotNull() & F.col("fixes")[m["ref"]].isNotNull(),
            F.struct(
                F.col("fixes")[m["ref"]].alias("type"),
                m["ref"].alias("ref"),
                m["role"].alias("role"),
            ),
        ).otherwise(m),
    )
    return joined.withColumn(
        "members",
        F.when(F.col("members").isNotNull(), fixed_members).otherwise(F.col("members")),
    ).drop("rel_id", "fixes")


def update_states(docs: DataFrame, state: str = "WA") -> DataFrame:
    """Set addr.state wherever addr.postcode exists
    (mongo_audit.py:22-43, M1 update_many + $set) as an immutable
    column rewrite; Delta MERGE is the scalable in-place variant."""
    has_zip = F.col("addr").isNotNull() & F.col("addr.postcode").isNotNull()
    return docs.withColumn(
        "addr",
        F.when(has_zip, F.col("addr").withField("state", F.lit(state))).otherwise(
            F.col("addr")
        ),
    )


def update_states_report(docs: DataFrame, state: str = "WA") -> DataFrame:
    """The reference's Pre/Matched/Modified/Post count matrix
    (mongo_audit.py:22-43, A10) as one aggregation."""
    has_zip = F.col("addr").isNotNull() & F.col("addr.postcode").isNotNull()
    had_state = F.col("addr").isNotNull() & F.col("addr.state").isNotNull()
    return docs.agg(
        F.sum(had_state.cast("long")).alias("pre_state_count"),
        F.sum(has_zip.cast("long")).alias("matched"),
        F.sum((has_zip & ~F.coalesce(F.col("addr.state") == state, F.lit(False))).cast("long")).alias(
            "modified"
        ),
        F.sum((has_zip | had_state).cast("long")).alias("post_state_count"),
    )


def get_most_referenced(docs: DataFrame, ref_docs: DataFrame, limit: int = 3) -> DataFrame:
    """Top-k most-referenced documents with their payload
    (mongo_audit.py:341-381, J4+O1 get_most_refd).

    Scale: refer_count computed on the (already aggregated) ref_docs
    frame; top-k via TakeOrderedAndProject (no global sort); the k-row
    result broadcast-joins back to docs for the payload."""
    top = (
        ref_docs.select("_id", F.size("refers").alias("refer_count"))
        .orderBy(F.desc("refer_count"), F.asc("_id"))
        .limit(limit)
    )
    return (
        docs.join(F.broadcast(top), "_id", "inner")
        .select("_id", "doc_type", "name", "refer_count")
        .orderBy(F.desc("refer_count"), F.asc("_id"))
    )


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE semantics without a transactional table format: WHEN
    MATCHED take the source row wholesale, WHEN NOT MATCHED BY TARGET
    insert the source row, else keep the target row (the reference's
    replace-into-collection idiom, and Delta/Iceberg ``MERGE`` as a
    pure transform over immutable inputs).

    One full-outer join on the key; matched-ness decides per ROW (not
    per column -- a source row with nulls still replaces its target
    row, exactly like ``WHEN MATCHED THEN UPDATE SET *``).

    Scale: a single key-partitioned shuffle join; with both sides
    bucketed on the key (operators/skew.write_bucketed) it is
    exchange-free, which is how a recurring ingest upsert should run.
    """
    cols = target.columns
    t = target.alias("t")
    # Presence marker instead of testing s.key IS NOT NULL: a source
    # row with a null key never matches the join condition but must
    # still be emitted as an insert (not collapse to an all-null row).
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    matched = F.col("s._s_present").isNotNull()
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    return joined.select(
        *[
            F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )


def merge_statement(target_table: str, source_view: str, key: str) -> str:
    """The ANSI ``MERGE INTO`` equivalent of :func:`merge_upsert`.

    Semantics parity: ``ON t.key = s.key`` (plain equality, so a
    null-key source row is NOT MATCHED and inserts -- the same row the
    transform's full-outer join emits), ``UPDATE SET *`` (source row
    wholesale, nulls included), ``INSERT *``.
    """
    return (
        f"MERGE INTO {target_table} t\n"
        f"USING {source_view} s\n"
        f"ON t.{key} = s.{key}\n"
        f"WHEN MATCHED THEN UPDATE SET *\n"
        f"WHEN NOT MATCHED THEN INSERT *"
    )


def merge_upsert_into(
    spark: SparkSession, target_table: str, source: DataFrame, key: str
) -> None:
    """Execute a REAL ``MERGE INTO`` against a transactional table.

    This is the at-scale form of the reference's in-place
    ``update_many``/``find_one_and_update`` writes
    (mongo_audit.py:33-35,235-268): instead of rewriting the whole
    table (:func:`merge_upsert` + overwrite), an ACID format
    (Delta/Iceberg) rewrites only the files containing matched keys --
    at 100 TB that is the difference between touching gigabytes and
    touching everything.

    Requires a catalog whose format supports MERGE; Spark's built-in
    parquet tables do not (they raise the same way a missing
    Delta/Iceberg jar does), so callers environment-gate exactly like
    the MongoDB sink (sources/sinks.py): attempt, and fall back to
    ``merge_upsert`` + overwrite when the capability is absent.  The
    sandbox ships no transactional-format jar (and no network to
    vendor one), so the gated pytest (tests/test_audits.py) documents
    and skips the STATEMENT path there -- but the transactional
    SEMANTICS execute un-gated via sources/cow_table.CowTable, which
    implements the same contract (this merge_upsert transform + commit
    log + copy-on-write file pruning + atomic commits) natively; see
    tests/test_cow_table.py and the merge_cow probe in SINKS_E2E.txt.
    """
    # Unique per call: a fixed name would let two concurrent merges in
    # one session clobber each other's source view, and the finally
    # could drop a view another caller just registered.
    view = f"_merge_upsert_source_{uuid.uuid4().hex}"
    source.createOrReplaceTempView(view)
    try:
        spark.sql(merge_statement(target_table, view, key))
    finally:
        spark.catalog.dropTempView(view)
