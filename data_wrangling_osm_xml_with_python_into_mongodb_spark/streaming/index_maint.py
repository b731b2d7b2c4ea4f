"""Streaming maintenance of the capped ref_docs index on mutable
storage -- the production shape of m10/m11 (VERDICT r10 #2).

The batch maintainers (operators/shape.apply_ref_docs_delta_capped,
m10) and the mutable-storage landing (CowTable MERGE, m11) compose
here into a continuously-maintained index: a document CDC stream
(full doc payloads tagged ``_op`` = insert|delete, exactly what any
CDC feed carries at delete time) drives ``foreachBatch``; each
micro-batch

1. MERGEs the document batch into the mutable ``documents`` CowTable
   (the corpus the capped refill path reads), then
2. computes the changes-only capped index delta
   (ref_docs_delta_capped_changes: upserts + emptied-posting delete
   keys) against the index table's CURRENT snapshot, and
3. MERGEs that delta into the index CowTable -- only files containing
   touched refs rewrite.

Exactly-once by IDEMPOTENCE, the standard transactional-foreachBatch
recipe (same as the Mongo wire sink, sources/sinks.py:159): Spark's
replay contract redelivers an uncommitted batch with the SAME batchId
and rows after a restart; every CowTable commit records the batchId
it applied (``merge(meta=...)``, Delta's txnAppId/txnVersion
analogue), and the applier skips any table whose recorded batchId is
already at-or-beyond the incoming one.  A crash BETWEEN the two
merges therefore replays into "corpus already applied, index not" and
converges: the corpus merge no-ops, the index merge runs -- which is
why step 2 reads the corpus AFTER its merge (the capped maintainer
wants ``corpus_after`` anyway) and derives the delta from the batch
rows, never from corpus diffs.

Scale shape: per micro-batch cost is O(batch + touched-files), never
O(corpus) -- the index is read (not shuffled; broadcast-only joins,
plan-asserted in tests/test_incremental_mview.py), the refill path
prunes the corpus read by a broadcast semi-join on flagged refs, and
the CowTable MERGE rewrites only affected files.  The reference's
analogue is drop-and-recreate of its ref index per run
(mongo_audit.py:271-329); this is the same result maintained
continuously with bounded per-batch work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.shape import ref_docs_delta_capped_changes
from ..sources.cow_table import CowTable

_DOC_CDC_COLS = (
    "_id string, doc_type string, node_refs array<string>, "
    "members array<struct<type:string,ref:string,role:string>>, _op string"
)


def last_applied_batch(table: CowTable, app_id: str) -> int:
    """Largest batchId this table has committed for ``app_id``; -1 if
    none.  Walks the commit log newest-first (driver-sized metadata)."""
    for v in range(table.version(), -1, -1):
        m = table._commit_doc(v).get("app_meta") or {}
        if m.get("app_id") == app_id:
            return int(m["batch_id"])
    return -1


def read_doc_cdc_stream(
    spark: SparkSession,
    batches_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-source stream of document CDC batches: each parquet file in
    ``batches_dir`` is one batch of full-payload changes tagged
    ``_op`` in {'insert','delete'} (a delete carries the document as of
    deletion, which is what the delta maintainers need and what real
    CDC feeds provide).  ``maxFilesPerTrigger=1`` keeps one file per
    micro-batch -- deterministic batch boundaries for tests; production
    would raise it."""
    reader = spark.readStream.schema(_DOC_CDC_COLS).option(
        "pathGlobFilter", "*.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(batches_dir)


def ref_docs_maintenance_batch_applier(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    cap: int,
    app_id: str = "ref_docs_maint",
):
    """The ``foreachBatch`` body: apply one CDC micro-batch to the
    documents table and then to the capped ref_docs index, each merge
    idempotently keyed by (app_id, batchId).  Returned as a callable
    so tests can also drive it directly (e.g. forced redelivery)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands over an ephemeral view; the two merges
        # each traverse it several times (touch keys, affected files,
        # re-merge), so pin the batch once.  Batches are small by
        # contract -- this is delta-sized, not corpus-sized.
        batch_df = batch_df.localCheckpoint(eager=True)
        ins = batch_df.filter(F.col("_op") == "insert").drop("_op")
        dels = batch_df.filter(F.col("_op") == "delete").drop("_op")
        corpus = CowTable(spark, corpus_path)
        index = CowTable(spark, index_path)
        meta = {"app_id": app_id, "batch_id": int(batch_id)}
        if last_applied_batch(corpus, app_id) < batch_id:
            corpus.merge(
                ins, "_id", deletes=dels.select("_id"), retries=2, meta=meta
            )
        if last_applied_batch(index, app_id) < batch_id:
            ups, del_keys = ref_docs_delta_capped_changes(
                index.read(), ins, dels, corpus.read(), cap
            )
            index.merge(ups, "_id", deletes=del_keys, retries=2, meta=meta)

    return _apply


def run_ref_docs_maintenance_stream(
    spark: SparkSession,
    batches_dir: str,
    corpus_path: str,
    index_path: str,
    cap: int,
    checkpoint_dir: str,
    app_id: str = "ref_docs_maint",
) -> None:
    """Drive the CDC stream over the batch files currently in
    ``batches_dir`` and return once all are applied (restartable: the
    checkpoint remembers consumed files, the app_meta commits make
    redelivered batches no-ops)."""
    stream = read_doc_cdc_stream(spark, batches_dir)
    q = (
        stream.writeStream.foreachBatch(
            ref_docs_maintenance_batch_applier(
                spark, corpus_path, index_path, cap, app_id
            )
        )
        .option("checkpointLocation", os.path.join(checkpoint_dir, app_id))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
