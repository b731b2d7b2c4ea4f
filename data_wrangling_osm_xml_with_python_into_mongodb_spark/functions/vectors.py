"""Vector math over ``array<float>`` embedding columns as native
column expressions.

Two formulations with identical IEEE results:

* generic ``aggregate``/``zip_with`` folds for unknown-width vectors --
  correct anywhere, but higher-order functions are interpreted
  (no whole-stage codegen), so they pay per-element lambda overhead;
* **unrolled** fixed-width chains (``dim=`` known, e.g. the 64-wide
  embeddings table): ``0.0 + a[1]*b[1] + a[2]*b[2] + ...`` -- plain
  arithmetic the codegen compiles, ~an order of magnitude faster in
  the ANN hot path.  The leading ``0.0 +`` reproduces the fold's seed
  so both shapes (and the DuckDB oracle's sequential
  ``list_dot_product``) produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is not None:
        out = F.lit(0.0)
        for d in range(1, dim + 1):
            out = out + F.element_at(a, d) * F.element_at(b, d)
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """dot(a,b) / (|a| * |b|) -- formula shape mirrored in oracle SQL."""
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def dot_literal(vec: Column, weights: list[float]) -> Column:
    """Sequential-fold dot of a column vector with a Python-side constant
    vector, unrolled into a codegen-friendly chain."""
    out = F.lit(0.0)
    for d, w in enumerate(weights, start=1):
        out = out + F.element_at(vec, d) * F.lit(w)
    return out


def cosine_sql(a: str, b: str) -> str:
    """DuckDB SQL with the identical formula shape (list_dot_product is a
    sequential fold over DOUBLE[] like our ``aggregate``)."""
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
