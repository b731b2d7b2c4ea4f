"""Document sinks (reference S3-S6, SURVEY.md §2.1).

The reference appends one ``json.dumps`` line per document to a file
(clean_and_write.py:413-420) and bulk-loads it with mongoimport
(main.ipynb cell 31).  Spark-side:

* newline-JSON: ``df.write.json`` -- one file per partition, written
  in parallel straight from executors (no driver funnel);
* parquet: the canonical analytic store (column pruning + predicate
  pushdown for every downstream query);
* MongoDB: the mongo-spark-connector if present (optional dependency,
  import-gated); parity sink only, never the engine.

Overwrite mode mirrors the reference's drop-then-recreate lifecycle
(mongo_audit.py:325-327, main.ipynb cell 31 drop_database).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Newline-JSON sink (reference write_el, clean_and_write.py:413-420)."""
    docs.write.mode(mode).json(path)


def write_parquet(
    docs: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: str | None = None,
) -> None:
    """Canonical parquet sink.

    ``partition_by`` gives partition pruning (e.g. doc_type);
    ``sort_by`` emulates the reference's sparse name index
    (main.ipynb cell 52) via min/max data skipping: sorting within
    partitions tightens per-row-group statistics so point lookups on
    the sorted column skip row groups."""
    out = docs
    if sort_by is not None:
        out = out.sortWithinPartitions(sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def mongo_write_options(uri: str, database: str, collection: str) -> dict[str, str]:
    """The mongo-spark-connector option map (its documented option
    names); factored out so the wiring is unit-testable without the
    connector jar."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }


def write_mongodb(
    docs: DataFrame,
    uri: str,
    database: str,
    collection: str,
    mode: str = "overwrite",
) -> bool:
    """MongoDB sink via mongo-spark-connector (reference S4 mongoimport,
    main.ipynb cell 31).  Returns False when the connector is not on
    the classpath (optional dependency); any OTHER failure (bad URI,
    auth, write error) raises -- a real write error must not be
    silently swallowed."""
    writer = docs.write.format("mongodb").mode(mode).options(
        **mongo_write_options(uri, database, collection)
    )
    try:
        writer.save()
        return True
    except Exception as e:  # connector absent <=> datasource unresolvable
        msg = str(e)
        if (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find the data source" in msg
            or "Failed to find data source" in msg  # Spark <= 3.3 phrasing
            or "ClassNotFoundException" in msg
        ):
            return False
        raise


def _bsonable(v):
    """Row/Decimal/numpy scalars -> plain BSON-encodable Python."""
    import decimal

    from pyspark.sql import Row

    if isinstance(v, Row):
        return {k: _bsonable(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _bsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_bsonable(x) for x in v]
    if isinstance(v, decimal.Decimal):
        return float(v)
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        return v.item()
    return v


def write_mongodb_wire(
    docs: DataFrame,
    host: str,
    port: int,
    database: str,
    collection: str,
    mode: str = "overwrite",
    batch_size: int = 1000,
) -> int:
    """First-party MongoDB sink over the raw wire protocol (reference
    S4 -- mongoimport bulk load, main.ipynb:1269-1270 -- re-expressed
    as a DISTRIBUTED insert): every partition opens its own OP_MSG
    connection (sources/mongo_wire.py, no driver dependency) and bulk
    inserts its rows in ``batch_size`` batches, so the load runs from
    all executors in parallel instead of funneling through one
    mongoimport process.  ``mode='overwrite'`` drops the collection
    first, mirroring the reference's drop-then-recreate lifecycle
    (mongo_audit.py:325-327).  Returns the server's post-load count --
    callers assert it against ``docs.count()`` for the round-trip
    check.  Proven e2e against tools/fake_mongod.py (real TCP, real
    BSON) in tests/test_mongo_wire.py; a real mongod accepts the same
    bytes."""
    from .mongo_wire import MongoWireClient

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    with MongoWireClient(host, port) as admin:
        if mode == "overwrite":
            admin.drop_collection(database, collection)

        def _write_partition(rows) -> None:
            client = MongoWireClient(host, port)
            try:
                batch: list[dict] = []
                for row in rows:
                    batch.append(_bsonable(row))
                    if len(batch) >= batch_size:
                        client.insert_many(database, collection, batch)
                        batch = []
                if batch:
                    client.insert_many(database, collection, batch)
            finally:
                client.close()

        docs.foreachPartition(_write_partition)
        return admin.count(database, collection)


def mongodb_wire_foreach_batch(
    host: str,
    port: int,
    database: str,
    collection_prefix: str,
    batch_size: int = 1000,
):
    """Structured Streaming sink over the wire-protocol client:
    returns a ``foreachBatch`` callable that lands micro-batch N in
    collection ``{prefix}_{N}`` with ``mode='overwrite'``.

    Exactly-once visible rows by IDEMPOTENCE, the standard foreachBatch
    recipe: Spark's replay contract guarantees a restarted query
    redelivers an uncommitted batch with the SAME batchId and the same
    rows, and the batch-id-keyed overwrite makes that redelivery a
    no-op -- the collection is dropped and rewritten with identical
    content.  Serving-side reads union the ``{prefix}_*`` collections
    (or a downstream job compacts them); the analytic store remains
    parquet, Mongo is the serving sink (reference S4,
    main.ipynb:1269-1270).  Proven e2e with a mid-stream restart +
    forced same-batch redelivery in tests/test_streaming.py."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        write_mongodb_wire(
            batch_df,
            host,
            port,
            database,
            f"{collection_prefix}_{batch_id}",
            mode="overwrite",
            batch_size=batch_size,
        )

    return _write


def read_mongodb_wire(
    spark,
    host: str,
    port: int,
    database: str,
    collection: str,
    schema=None,
) -> DataFrame:
    """Readback for the wire sink: driver-side find (batched cursor)
    into a DataFrame.  Parity/verification path for collection-sized
    data -- a production read of a LARGE collection would instead
    partition the key space and issue one find per partition from
    executors (same client, one range filter each); the engine's
    analytic store is parquet, Mongo is the serving-side sink."""
    from .mongo_wire import MongoWireClient

    with MongoWireClient(host, port) as client:
        rows = client.find_all(database, collection)
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    return spark.createDataFrame(rows)
