"""Weighted SSSP cross-operator invariants: with unit-minimum integer
costs, hops <= dist <= WMOD * hops against graph_bfs_distance, same
reach set, and seeds at distance 0."""

from dig_aggregator_core_spark.operators import graph as G


def test_sssp_sandwiched_by_bfs_hops(spark, sf_dir):
    hops = {
        r["user_id"]: r["dist"]
        for r in G.graph_bfs_distance(spark, sf_dir).collect()
    }
    dist = {
        r["user_id"]: r["dist"]
        for r in G.graph_sssp_weighted(spark, sf_dir).collect()
    }
    assert set(hops) == set(dist)  # identical reach within the bound
    assert hops
    for u, h in hops.items():
        assert h <= dist[u] <= G._SSSP_WMOD * h, (u, h, dist[u])
        if h == 0:
            assert dist[u] == 0
