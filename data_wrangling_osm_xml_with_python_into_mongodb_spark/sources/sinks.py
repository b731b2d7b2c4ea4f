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
