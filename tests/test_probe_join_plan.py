"""Plan pin for ann_index_probe_join (VERDICT r9 task 5): the probed
buckets must reach the partitioned index as a JOIN (dynamic partition
pruning), never as a driver-collected literal IN-list — the IN device
caps the op at panel-sized query sets; the join form serves
corpus-as-queries. Results must equal the IN-list twin exactly."""

from __future__ import annotations

from dig_aggregator_core_spark.operators.similarity import (
    ann_index_append_query,
    ann_index_probe_join,
)

SF_DIR = "/root/testdata/sf0.01"


def test_probe_join_plan_is_dpp_not_literal(spark):
    df = ann_index_probe_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the index scan is pruned at RUNTIME by the broadcast bucket set
    assert "dynamicpruning" in plan, plan[:2000]
    # and no literal bucket list was inlined into the scan
    assert "pbucket IN (b" not in plan
    assert " IN (b0" not in plan and " IN (b1" not in plan


def test_probe_join_matches_inlist_twin(spark):
    join_rows = {
        tuple(r) for r in ann_index_probe_join(spark, SF_DIR).collect()
    }
    inlist_rows = {
        tuple(r) for r in ann_index_append_query(spark, SF_DIR).collect()
    }
    assert join_rows == inlist_rows


def test_gated_serving_paths_pick_by_probe_count(spark, monkeypatch):
    """VERDICT r10 task 4: the IN-list serving paths are now gated by
    the distinct probe-bucket count. Under the gate (every fixture-scale
    panel) the plan keeps the static IN-list literal; above it, the
    SAME op flips to the broadcast-semi-join + DPP shape with no driver
    bucket list — and returns identical rows."""
    from dig_aggregator_core_spark.operators import similarity as S

    small = S.ann_index_append_query(spark, SF_DIR)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    # under the gate: the probed buckets are a STATIC IN literal in the
    # index scan's PartitionFilters (Catalyst may add its own DPP on the
    # scoring join on top — that's free, not the driver list)
    assert " IN (b" in plan_small, plan_small[:2000]

    monkeypatch.setattr(S, "_PROBE_INLIST_MAX", 0)
    big = S.ann_index_append_query(spark, SF_DIR)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan_big, plan_big[:2000]
    assert " IN (b" not in plan_big  # no driver-collected literal
    assert {tuple(r) for r in big.collect()} == {
        tuple(r) for r in small.collect()
    }


def test_gated_multiprobe_and_persist_paths(spark, monkeypatch):
    from dig_aggregator_core_spark.operators import similarity as S

    for fn in (S.ann_index_append_multiprobe, S.ann_index_persist):
        base = {tuple(r) for r in fn(spark, SF_DIR).collect()}
        monkeypatch.setattr(S, "_PROBE_INLIST_MAX", 0)
        joined = fn(spark, SF_DIR)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert " IN (b" not in plan, (fn.__name__, plan[:1500])
        assert {tuple(r) for r in joined.collect()} == base
        monkeypatch.setattr(S, "_PROBE_INLIST_MAX", 256)
