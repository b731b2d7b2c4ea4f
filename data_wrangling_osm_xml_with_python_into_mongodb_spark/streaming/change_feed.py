"""Structured-Streaming source over a CowTable's change data feed --
the Delta "CDF as a streaming source" analogue: a downstream consumer
(replica, index maintainer, audit log) tails the table's row-level
changes live instead of polling ``read_changes`` ranges.

Mechanism: mutation commits on a ``change_feed=True`` table write
their change sets under ``<table>/changes/v<N>-<token>/`` BEFORE the
commit links (sources/cow_table.py), so a file-source stream over
that directory picks each commit's change files up exactly once per
Spark's file-source checkpoint.  ``_commit_version`` is recovered
from the directory name; ``_change_type`` rides in the files.

Delivery contract: Spark's file source gives exactly-once FILE
delivery, but a writer that LOSES the optimistic-concurrency race
removes its change dir only after writing it -- a stream polling in
that window can ingest a loser's rows (they describe a mutation that
never committed).  Single-writer tables cannot hit this; multi-writer
consumers that need exactly-once-COMMITTED semantics call
:func:`committed_changes` inside ``foreachBatch``, which keeps only
rows whose change file a committed version actually references --
the same validate-against-the-log move Delta's CDF reader gets for
free by reading the log instead of the directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.cow_table import CowTable


def stream_changes(
    spark: SparkSession,
    table_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """ReadStream of a CowTable's change feed: one row per change-feed
    row, carrying the table columns plus ``_change_type``,
    ``_commit_version`` (from the change dir name), and
    ``_change_file`` (for :func:`committed_changes` validation).

    The schema is pinned at stream start from the table's current
    snapshot (file streams need a static schema); a schema evolution
    mid-stream widens later files, whose new columns surface after a
    stream restart -- Delta's CDF streaming has the same restart
    contract.  The ``create`` commit's rows do NOT stream (they are
    derived, not materialized -- read them with
    ``read_changes(0, 0)`` when bootstrapping a replica, then start
    the stream)."""
    table = CowTable(spark, table_path)
    head = table.version()
    if head < 0:
        raise FileNotFoundError(f"no CowTable at {table_path}")
    if not table._commit_doc(head).get("change_feed"):
        raise ValueError(
            f"{table_path} does not have the change feed enabled "
            "(create(change_feed=True))"
        )
    schema = table._snapshot_schema(head).add("_change_type", "string")
    # The glob re-evaluates every trigger, so change dirs committed
    # after stream start are picked up; the dir itself must exist for
    # the first trigger (harmless to pre-create -- writers use
    # token-suffixed subdirs).
    changes_dir = os.path.join(table.path, "changes")
    os.makedirs(changes_dir, exist_ok=True)
    reader = spark.readStream.schema(schema).option(
        "pathGlobFilter", "*.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(os.path.join(changes_dir, "*")).select(
        "*",
        F.regexp_extract(
            F.col("_metadata.file_path"), r"/v(\d+)-[0-9a-f]+/[^/]+$", 1
        )
        .cast("long")
        .alias("_commit_version"),
        F.col("_metadata.file_path").alias("_change_file"),
    )


def committed_changes(batch_df: DataFrame, table: CowTable) -> DataFrame:
    """Filter a :func:`stream_changes` micro-batch to rows whose
    change file a COMMITTED version references -- drops a losing
    racer's output if the stream won the race against its cleanup.
    Driver work is O(distinct versions in the batch) commit-doc reads
    (metadata-plane, delta-sized); the filter itself is a codegen'd
    isin over the batch's file set."""
    versions = [
        int(r["_commit_version"])
        for r in batch_df.select("_commit_version").distinct().collect()
        if r["_commit_version"] is not None
    ]
    head = table.version()
    ok: set[str] = set()
    for v in versions:
        if 0 <= v <= head:
            for f in table._commit_doc(v).get("change_files", []) or []:
                # match on the token dir + basename (the file source
                # reports URIs; commit docs record local paths)
                ok.add("/".join(os.path.abspath(f).split("/")[-2:]))
        # versions above head: never committed (yet) -- dropped; a
        # racing commit that DOES land re-delivers nothing (the file
        # was consumed), so consumers poll read_changes for gaps or
        # run single-writer.
    tail = F.concat_ws(
        "/",
        F.element_at(F.split(F.col("_change_file"), "/"), -2),
        F.element_at(F.split(F.col("_change_file"), "/"), -1),
    )
    return batch_df.filter(tail.isin(sorted(ok)) if ok else F.lit(False))
