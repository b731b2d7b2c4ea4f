"""Connected-components operator (operators/graph.py): star
contraction vs a driver-side union-find oracle, deep-chain convergence
(the case that defeats diameter-bound propagation), and the
raise-don't-return-partial contract."""

from __future__ import annotations

import random

import pytest

from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.graph import (
    ConvergenceError,
    connected_components,
)


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-reachable-id labels
    return {n: find(n) for n in parent}


def _run_cc(spark, edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, **kw).collect()
    }


def test_cc_matches_union_find_on_random_graph(spark):
    rng = random.Random(20260814)
    edges = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(250)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    assert _run_cc(spark, edges) == _union_find_labels(edges)


def test_cc_deep_chain_converges_in_log_rounds(spark):
    # Diameter 199: propagation would need 199 rounds; star contraction
    # must finish well inside the default cap.
    edges = [(i, i + 1) for i in range(200)]
    labels = _run_cc(spark, edges)
    assert labels == {i: 0 for i in range(201)}


def test_cc_mixed_components_and_stars(spark):
    # A chain, a star, a triangle, and a lone pair -- min-id per component.
    edges = (
        [(i, i + 1) for i in range(40, 80)]
        + [(1000, v) for v in range(1001, 1020)]
        + [(5, 6), (6, 7), (7, 5)]
        + [(9000, 8999)]
    )
    labels = _run_cc(spark, edges)
    want = _union_find_labels(edges)
    assert labels == want
    assert labels[79] == 40 and labels[1019] == 1000 and labels[7] == 5


def test_cc_raises_instead_of_partial_labels(spark):
    # A 200-chain cannot reach fixpoint in 1 round; the contract is an
    # explicit error, never silently-wrong labels.
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(ConvergenceError):
        connected_components(df, max_rounds=1).collect()


def test_propagate_or_contract_fallback_is_exact(spark):
    """When the diameter exceeds the propagation budget, dd7's helper
    must switch to star contraction and return EXACT labels, never the
    partial propagation state."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_dedup import (
        propagate_or_contract,
    )

    chain = [(i, i + 1) for i in range(60)]
    edges = spark.createDataFrame(chain, "id_a long, id_b long")
    # Budget of 2 rounds on a diameter-60 chain: propagation cannot
    # converge; the fallback must still produce all-zeros labels.
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in propagate_or_contract(edges, max_rounds=2).collect()
    }
    assert labels == {i: 0 for i in range(61)}
    # And with a sufficient budget, propagation itself converges to the
    # same answer.
    labels2 = {
        r["doc_id"]: r["cluster_id"]
        for r in propagate_or_contract(edges, max_rounds=100).collect()
    }
    assert labels2 == labels
