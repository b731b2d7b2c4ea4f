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

# String operands take the expr() fast path: building a 64-term
# unrolled chain with Column operators costs ~200 py4j round-trips PER
# CALL SITE (measured 1.8s of driver time just CONSTRUCTING v5's
# DataFrame); rendering the same chain as one SQL string and parsing
# it with a single F.expr call is ~50x fewer JVM crossings for an
# identical expression tree (same operations, same left-to-right IEEE
# order).  `name[d]` is 0-based GetArrayItem == element_at(name, d+1)
# on in-range indices, which fixed-width embeddings guarantee.


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def _expr_dot(a: str, b: str, dim: int) -> Column:
    terms = " + ".join(f"{a}[{d}] * {b}[{d}]" for d in range(dim))
    return F.expr(f"0.0D + {terms}")


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    if dim is not None:
        if isinstance(a, str) and isinstance(b, str):
            return _expr_dot(a, b, dim)
        out = F.lit(0.0)
        for d in range(1, dim + 1):
            out = out + F.element_at(a, d) * F.element_at(b, d)
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """dot(a,b) / (|a| * |b|) -- formula shape mirrored in oracle SQL."""
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def dot_literal(vec: Column | str, weights: list[float]) -> Column:
    """Sequential-fold dot of a column vector with a Python-side constant
    vector, unrolled into a codegen-friendly chain.  String input takes
    the one-parse expr path; `repr(w)` round-trips doubles exactly and
    the CAST-from-string constant-folds at plan time."""
    if isinstance(vec, str):
        terms = " + ".join(
            f"{vec}[{d}] * CAST('{w!r}' AS DOUBLE)"
            for d, w in enumerate(weights)
        )
        return F.expr(f"0.0D + {terms}")
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
