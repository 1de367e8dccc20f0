"""Property test for the alternating star-contraction fixpoint
(operators/dedup.py _large_star / _small_star) — the connected-components
engine behind dedup_connected_components and dedup_cluster_representative.
After the window-min restructure (one exchange per star instead of
groupBy + self-join), these pin the algorithm against a brute-force
union-find oracle on adversarial random graphs: every node must label
with the MINIMUM id of its component, and the fixpoint must be a star
forest (each edge points non-root -> component minimum)."""

from __future__ import annotations

import pytest

# integration-style tier: excluded from the default fast gate run
# (pytest.ini); the full suite runs with -m "slow or not slow"
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators.dedup import (
    _large_star,
    _small_star,
)


def _union_find(n_nodes: set[int], edges: set[tuple[int, int]]):
    parent = {n: n for n in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp: dict[int, int] = {}
    for n in n_nodes:
        r = find(n)
        comp.setdefault(r, n)
        comp[r] = min(comp[r], n)
    return {n: comp[find(n)] for n in n_nodes}


def _contract_to_fixpoint(spark, edge_list):
    edges = (
        spark.createDataFrame(edge_list, "u bigint, v bigint")
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()
    for _ in range(64):  # logarithmic convergence; 64 = generous ceiling
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        n_new = new_edges.count()
        if n_new == n_edges and new_edges.exceptAll(edges).isEmpty():
            return new_edges
        edges, n_edges = new_edges, n_new
    raise AssertionError("star contraction did not converge in 64 rounds")


# graph shapes that stress the contraction: chains (worst diameter),
# stars (worst fan-out), and dense random clumps (duplicate/ cyclic edges)
_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edge_list=_edges_strategy)
def test_fixpoint_matches_union_find(spark, edge_list):
    fix = _contract_to_fixpoint(spark, edge_list)
    got = {
        (r["u"], r["v"])
        for r in fix.select("u", "v").collect()
    }
    nodes = {n for e in edge_list for n in e}
    want_label = _union_find(nodes, set(edge_list))
    # fixpoint is a star forest: non-root -> its component minimum, and
    # nothing else (roots carry no outgoing edge)
    want_edges = {
        (n, m) for n, m in want_label.items() if n != m
    }
    assert got == want_edges


def test_long_chain_converges_logarithmically(spark):
    """A 64-node path is the diameter-adversarial case (plain min-label
    propagation needs 63 rounds); alternating star contraction must
    finish in O(log n) — pin a ceiling of 10 rounds."""
    chain = [(i, i + 1) for i in range(63)]
    edges = (
        spark.createDataFrame(chain, "u bigint, v bigint")
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()
    rounds = 0
    while True:
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        n_new = new_edges.count()
        rounds += 1
        if n_new == n_edges and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            break
        edges, n_edges = new_edges, n_new
        assert rounds <= 10, "star contraction lost its log-round bound"
    labels = {(r["u"], r["v"]) for r in edges.collect()}
    assert labels == {(i, 0) for i in range(1, 64)}


def test_self_and_duplicate_edges_are_inert(spark):
    """Duplicate edges and both orientations of the same pair must not
    change the fixpoint (the distinct sweeps inside each star)."""
    messy = [(1, 2), (2, 1), (1, 2), (3, 4), (4, 3), (2, 3)]
    fix = _contract_to_fixpoint(spark, messy)
    got = {(r["u"], r["v"]) for r in fix.collect()}
    assert got == {(2, 1), (3, 1), (4, 1)}
