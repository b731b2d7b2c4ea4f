"""Skew-resistant joins: salting and bucketed co-location.

Two standard levers for the shuffles that dominate at 100 TB:

* **Salting** (:func:`salted_join`): a hot join key (one key holding a
  large fraction of the fact side) lands every matching row in ONE
  shuffle partition -- one straggler task, however many executors.
  Salting appends a deterministic ``pmod(hash(row), n_salt)`` component
  to the fact side's key and replicates the (small) dimension side once
  per salt value, spreading the hot key across ``n_salt`` tasks.  The
  join result is IDENTICAL to the unsalted join (verified by the
  oracle-gated ``j6_salted_skew_join``); only the partitioning changes.
  AQE's skew-join splitting covers moderate skew automatically; salting
  is the explicit tool for the pathological single-key case.

* **Bucketing** (:func:`write_bucketed`): pre-shuffling both sides of a
  recurring join into the same bucket layout at WRITE time makes every
  subsequent join on that key exchange-free (verified by a plan
  assertion in tests/test_skew_bucketing.py) -- the amortized answer
  for dimension/fact joins repeated across a pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with (small) ``dim`` on ``key``, salted so a
    hot key spreads over ``n_salt`` shuffle partitions.

    The salt is deterministic (hash of the fact row's columns), so the
    plan stays reproducible; the dim side is exploded once per salt
    value (|dim| * n_salt rows -- fine for dimension-sized inputs).

    Only ``inner``/``left`` are valid: a right/full join would emit
    each UNMATCHED dim row once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got how={how!r}: "
            "the replicated dim side would duplicate unmatched rows"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salt)])),
    )
    joined = fact_s.join(dim_s, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``key``: joins between
    tables bucketed the same way on the join key need no exchange."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
