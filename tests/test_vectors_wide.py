"""Dim-dispatch property tests for the vector kernels.

The unrolled expression chains are only rendered up to
``UNROLL_MAX_DIM``; production embedding widths (768+) go through the
Arrow numpy kernels.  These tests pin (a) that dispatch picks the
intended path on each side of the threshold, and (b) that the two
paths agree numerically on identical data at dim 64 (oracle width) and
dim 768 (production width) -- agreement is allclose, not bit-equality,
because numpy's pairwise summation rounds differently from the
sequential fold in the last ulp.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions import vectors as V


def _vectors(n: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random vectors (no RNG: reproducible rows
    independent of seed/library version)."""
    return [
        [((i * 31 + d * 7 + 13) % 97) / 97.0 - 0.5 for d in range(dim)]
        for i in range(n)
    ]


def _pairs_df(spark, dim: int, n: int = 40):
    vs = _vectors(n, dim)
    rows = [(i, vs[i], vs[(i * 17 + 5) % n]) for i in range(n)]
    return spark.createDataFrame(
        rows, "id: long, a: array<double>, b: array<double>"
    )


def test_narrow_dispatch_stays_expression(spark):
    """dim <= UNROLL_MAX_DIM must NOT touch the Arrow kernels: the
    oracle-gated 64-dim surface depends on the bit-exact fold."""
    V._WIDE_KERNELS.clear()
    df = _pairs_df(spark, 64).select(
        V.dot("a", "b", dim=64).alias("d"),
        V.cosine(F.col("a"), F.col("b"), dim=64).alias("c"),
    )
    df.collect()
    assert V._WIDE_KERNELS == {}


@pytest.mark.parametrize("dim", [64, 768])
def test_wide_vs_fold_agree(spark, dim):
    """Arrow kernels == sequential HOF fold (any-dim reference path)
    within float tolerance, on dot, norm, and cosine.  At 64 the wide
    path is forced through the private kernels so both sides of the
    dispatch threshold are exercised on identical data."""
    df = _pairs_df(spark, dim)
    a, b = V.as_double(F.col("a")), V.as_double(F.col("b"))
    if dim > V.UNROLL_MAX_DIM:
        wide_dot = V.dot("a", "b", dim=dim)
        wide_cos = V.cosine("a", "b", dim=dim)
        wide_norm = V.norm("a", dim=dim)
    else:
        wide_dot = V._wide("dot")(a, b)
        wide_cos = V._wide("cosine")(a, b)
        wide_norm = V._wide("norm")(a)
    out = df.select(
        wide_dot.alias("wd"),
        V.dot(F.col("a"), F.col("b")).alias("fd"),
        wide_cos.alias("wc"),
        V.cosine(F.col("a"), F.col("b")).alias("fc"),
        wide_norm.alias("wn"),
        V.norm(F.col("a")).alias("fn"),
    ).collect()
    for r in out:
        assert math.isclose(r.wd, r.fd, rel_tol=1e-11, abs_tol=1e-11)
        assert math.isclose(r.wc, r.fc, rel_tol=1e-11, abs_tol=1e-11)
        assert math.isclose(r.wn, r.fn, rel_tol=1e-11, abs_tol=1e-11)
    # and the wide calls actually used the Arrow kernels
    assert set(V._WIDE_KERNELS) >= {"dot", "norm", "cosine"}


def test_dot_literal_wide_matches_numpy(spark):
    """Wide constant-vector dot (LSH planes at production width): the
    Arrow matvec equals the numpy reference computed driver-side."""
    dim, n = 768, 25
    weights = [((d * 11 + 3) % 101) / 101.0 - 0.5 for d in range(dim)]
    df = _pairs_df(spark, dim, n)
    got = {
        r.id: r.dl
        for r in df.select(
            "id", V.dot_literal(F.col("a"), weights).alias("dl")
        ).collect()
    }
    w = np.asarray(weights)
    for i, v in enumerate(_vectors(n, dim)):
        assert math.isclose(got[i], float(np.asarray(v) @ w), rel_tol=1e-11)


@pytest.mark.parametrize("dim", [768])
def test_wide_kernels_propagate_null_rows(spark, dim):
    """A NULL embedding must come back as NULL from the wide kernels --
    the unrolled and fold paths NULL-out via x * NULL, and pre-fix the
    Arrow path instead crashed np.stack with a ragged-shape ValueError.
    Covers dot/norm/cosine and the dot_literal matvec, plus all-null
    and no-null batch edges."""
    vs = _vectors(6, dim)
    rows = [
        (0, vs[0], vs[1]),
        (1, None, vs[2]),       # left null
        (2, vs[3], None),       # right null
        (3, None, None),        # both null
        (4, vs[4], vs[5]),
    ]
    df = spark.createDataFrame(
        rows, "id: long, a: array<double>, b: array<double>"
    ).repartition(1)
    weights = [((d * 11 + 3) % 101) / 101.0 - 0.5 for d in range(dim)]
    out = {
        r.id: r
        for r in df.select(
            "id",
            V.dot("a", "b", dim=dim).alias("d"),
            V.norm("a", dim=dim).alias("na"),
            V.cosine("a", "b", dim=dim).alias("c"),
            V.dot_literal(F.col("a"), weights).alias("dl"),
        ).collect()
    }
    for i in (1, 2, 3):
        assert out[i].d is None and out[i].c is None
    for i in (1, 3):
        assert out[i].na is None and out[i].dl is None
    # non-null rows still compute real values alongside nulls
    for i in (0, 4):
        a, b = np.asarray(rows[i][1]), np.asarray(rows[i][2])
        assert math.isclose(out[i].d, float(a @ b), rel_tol=1e-11)
        assert math.isclose(out[i].na, float(np.sqrt(a @ a)), rel_tol=1e-11)
    assert out[2].na is not None and out[2].dl is not None
