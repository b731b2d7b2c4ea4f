"""Vector math over ``array<float>`` embedding columns, as native
column expressions (``zip_with`` + ``aggregate`` stay inside codegen;
no Python crosses the row boundary).

All folds are sequential left-folds in double precision so the DuckDB
oracle (same formula shape over ``embedding::DOUBLE[]``) produces
bit-identical IEEE results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|) -- formula shape mirrored in oracle SQL."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB SQL with the identical formula shape (list_dot_product is a
    sequential fold over DOUBLE[] like our ``aggregate``)."""
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
