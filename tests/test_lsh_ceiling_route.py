"""Adaptive-LSH width-ceiling auto-route (VERDICT r11 task 4).

Past n = 2^_MAXBITS * 64 (~1.07e9 vectors) even the widest sign prefix
cannot hold the ~64/bucket occupancy target — the old behavior was a
docstring telling the user to switch to ann_ivf_probe. The op now
routes itself: above the ceiling it serves the IVF probe plan (centroid
count is a runtime knob) with the probed cell id as the `bucket`
column, keeping the LSH output schema. Both sides are pinned via
_LSH_ROUTE_STATS; the below-ceiling leg stays oracle-checked by the
driver (ann_lsh_adaptive / ann_lsh_buckets).
"""
from __future__ import annotations

from dig_aggregator_core_spark.operators import similarity as sim


def test_below_ceiling_serves_lsh(spark, sf_dir):
    before = dict(sim._LSH_ROUTE_STATS)
    out = sim.ann_lsh_adaptive(spark, sf_dir)
    assert sim._LSH_ROUTE_STATS["lsh"] == before["lsh"] + 1
    assert sim._LSH_ROUTE_STATS["ivf"] == before["ivf"]
    rows = out.collect()
    assert len(rows) > 0
    # LSH leg: bucket is a sign-bit prefix
    assert all(set(r["bucket"]) <= {"0", "1"} for r in rows)
    assert out.columns == ["query_id", "neighbor_id", "bucket",
                           "cosine", "rank"]


def test_above_ceiling_routes_to_ivf(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(sim, "_LSH_CEILING_N", 0)
    before = dict(sim._LSH_ROUTE_STATS)
    out = sim.ann_lsh_adaptive(spark, sf_dir)
    assert sim._LSH_ROUTE_STATS["ivf"] == before["ivf"] + 1
    # schema is unchanged across the route
    assert out.columns == ["query_id", "neighbor_id", "bucket",
                           "cosine", "rank"]
    routed = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in out.collect()
    )
    ivf = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in sim.ann_ivf_probe(spark, sf_dir).collect()
    )
    # modulo the bucket column the routed result IS the IVF probe result
    assert routed == ivf
    # bucket carries the probed cell id on this leg
    cents = {
        str(r["vec_id"])
        for r in sim._vecs(spark, sf_dir)
        .filter(sim.F.expr(sim._CENTROID_FILTER_SQL))
        .select("vec_id")
        .collect()
    }
    assert {r["bucket"] for r in out.collect()} <= cents


def test_both_registered_names_share_the_route(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(sim, "_LSH_CEILING_N", 0)
    before = dict(sim._LSH_ROUTE_STATS)
    sim.ann_lsh_buckets(spark, sf_dir).count()
    assert sim._LSH_ROUTE_STATS["ivf"] == before["ivf"] + 1
