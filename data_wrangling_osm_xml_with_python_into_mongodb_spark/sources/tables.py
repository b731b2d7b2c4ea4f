"""Parquet table loaders for the synthetic benchmark tables.

Columnar parquet scans are the canonical source: Catalyst pushes filters
into the scan (``PushedFilters``) and prunes columns (``ReadSchema``),
so every downstream query only pays for what it touches -- the property
that matters most at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: TIMESTAMP(NANOS), which Spark's parquet reader only
    surfaces as a nanos long (``nanosAsLong``), and TIMESTAMP(MICROS)
    without isAdjustedToUTC, which Spark 4 infers as TIMESTAMP_NTZ by
    default (``spark.sql.parquet.inferTimestampNTZ.enabled``).  Both are
    normalized here to a session-zoned TIMESTAMP so every downstream
    consumer (``withWatermark``, ``cast("long")`` epoch math, window
    functions) sees one stable type; micro truncation matches DuckDB's
    cast semantics in the oracle, and the oracle session runs UTC so the
    NTZ->TZ reinterpretation is value-identical.

    The ``nanosAsLong`` runtime conf is set here, not just in
    ``session.py``'s builder, so the loader is self-sufficient under any
    caller-provided SparkSession (the correctness driver constructs its
    own vanilla session).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table; keys match the DuckDB oracle views."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
