"""Vector math over ``array<float>`` embedding columns, dispatched on
vector width.

Three formulations:

* generic ``aggregate``/``zip_with`` folds for unknown-width vectors --
  correct anywhere, but higher-order functions are interpreted
  (no whole-stage codegen), so they pay per-element lambda overhead;
* **unrolled** fixed-width chains (``dim <= UNROLL_MAX_DIM``, e.g. the
  64-wide embeddings table): ``0.0 + a[1]*b[1] + a[2]*b[2] + ...`` --
  plain arithmetic the codegen compiles, ~an order of magnitude faster
  in the ANN hot path.  The leading ``0.0 +`` reproduces the fold's
  seed so both shapes (and the DuckDB oracle's sequential
  ``list_dot_product``) produce bit-identical doubles;
* **wide** Arrow-vectorized numpy kernels (``dim > UNROLL_MAX_DIM``):
  production embedding widths (768-4096) would render 12-64x bigger
  unrolled chains -- past Janino method limits, codegen falls back to
  interpreted, and driver planning time blows up (the 7-40x
  planning-cost cliff measured in operators/shape.py:14-19).  A
  ``pandas_udf`` over Arrow batches does the whole batch as one numpy
  ``einsum`` -- constant plan size in ``dim``, SIMD-vectorized, no
  per-row Python.  numpy's summation order differs from the sequential
  fold (einsum/BLAS accumulation), so results differ in the last ulp
  and are NOT bit-identical -- which is why the wide path starts above
  the oracle-gated 64-dim surface; the two paths are property-tested
  against each other at dims 64 and 768 (tests/test_vectors_wide.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Widest vector we unroll into an expression chain.  64 dims measured
# ~10x faster unrolled than the interpreted HOF fold; 128 keeps the
# generated method comfortably inside Janino/JIT limits (the cliff
# class starts several multiples above it, and 128 is the widest the
# DuckDB oracle surface uses).  Above this, kernels go through Arrow.
UNROLL_MAX_DIM = 128

_WIDE_KERNELS: dict = {}


def _masked_rows(fn, *series):
    """Apply a stacked-matrix kernel over the NON-NULL rows of one or
    more list-column Series, propagating NULL rows as NULL -- matching
    the unrolled/fold paths, where ``x * NULL`` nulls the whole result.
    Without the mask, ``np.stack`` raises ValueError on a batch that
    mixes vectors with None rows (ragged shapes), turning a null
    embedding into an opaque executor crash at dim > UNROLL_MAX_DIM.
    All-non-null batches (the common case) take the no-copy fast path.
    Element-level nulls *inside* a vector remain out of contract, as
    for every path: the embedding columns are fixed-width non-null
    arrays."""
    import numpy as np
    import pandas as pd

    mask = series[0].notna().to_numpy()
    for s in series[1:]:
        mask &= s.notna().to_numpy()
    if mask.all():
        return pd.Series(fn(*(np.stack(s.to_numpy()) for s in series)))
    out = np.full(len(mask), np.nan)
    if mask.any():
        out[mask] = fn(*(np.stack(s[mask].to_numpy()) for s in series))
    res = pd.array(out, dtype="Float64")
    res[~mask] = pd.NA
    return pd.Series(res)


def _wide(name: str):
    """Arrow numpy kernels for wide vectors, built lazily (pandas/numpy
    import + UDF registration deferred off the module import path) and
    cached so each kernel registers once per process.  Batches are
    rectangular by the fixed-width embedding-column contract."""
    if name not in _WIDE_KERNELS:
        import numpy as np
        import pandas as pd

        if name == "dot":

            def k(a, b):
                return _masked_rows(
                    lambda A, B: np.einsum("ij,ij->i", A, B), a, b
                )

        elif name == "norm":

            def k(a):
                return _masked_rows(
                    lambda A: np.sqrt(np.einsum("ij,ij->i", A, A)), a
                )

        else:  # cosine, fused: one Arrow transfer, not three UDF calls

            def _cos(A, B):
                num = np.einsum("ij,ij->i", A, B)
                na = np.sqrt(np.einsum("ij,ij->i", A, A))
                nb = np.sqrt(np.einsum("ij,ij->i", B, B))
                return num / (na * nb)

            def k(a, b):
                return _masked_rows(_cos, a, b)

        # Real (non-string) Series annotations: this module's
        # `from __future__ import annotations` would stringify inline
        # hints, and pyspark's typehint resolver can't evaluate them
        # without pandas in the module globals.
        k.__annotations__ = {
            p: pd.Series for p in list(k.__code__.co_varnames[: k.__code__.co_argcount])
        }
        k.__annotations__["return"] = pd.Series
        _WIDE_KERNELS[name] = F.pandas_udf(k, "double")
    return _WIDE_KERNELS[name]


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c

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
    if dim is not None and dim > UNROLL_MAX_DIM:
        return _wide("dot")(as_double(_as_col(a)), as_double(_as_col(b)))
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
    if dim is not None and dim > UNROLL_MAX_DIM:
        return _wide("norm")(as_double(_as_col(a)))
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """dot(a,b) / (|a| * |b|) -- formula shape mirrored in oracle SQL.
    Wide vectors take one fused Arrow kernel (a single batch transfer)
    instead of three expression-level folds."""
    if dim is not None and dim > UNROLL_MAX_DIM:
        return _wide("cosine")(as_double(_as_col(a)), as_double(_as_col(b)))
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def dot_literal(vec: Column | str, weights: list[float]) -> Column:
    """Sequential-fold dot of a column vector with a Python-side constant
    vector, unrolled into a codegen-friendly chain.  String input takes
    the one-parse expr path; `repr(w)` round-trips doubles exactly and
    the CAST-from-string constant-folds at plan time.  Wide constant
    vectors (LSH planes at production widths) close over a numpy array
    and run as one Arrow matvec per batch."""
    if len(weights) > UNROLL_MAX_DIM:
        import numpy as np
        import pandas as pd

        w = np.asarray(weights, dtype=np.float64)

        def k(v):
            return _masked_rows(lambda V: V @ w, v)

        k.__annotations__ = {"v": pd.Series, "return": pd.Series}
        return F.pandas_udf(k, "double")(as_double(_as_col(vec)))
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
