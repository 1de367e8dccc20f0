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
