"""Driver-state bound for the STREAMING incremental CC maintainer
(VERDICT r11 task 1): lifetime driver memory must stay O(bound) no
matter how long the ingest runs or how duplication-heavy it is.

The gate has two legs (mirroring the batch twin's _cc_labels_delta,
operators/dedup.py) and neither triggers corpus-sized work mid-stream:
  * an epoch whose contracted delta exceeds _DELTA_LOCAL_MAX is
    DEFERRED as a checkpointed batch-sized pair piece instead of being
    collected;
  * whenever the CUMULATIVE union-find crosses the lifetime bound (4x)
    it SPILLS its pairs as such a piece and resets.
At drain, deferred pieces + residual driver pairs recompose through
one distributed star-contraction fixpoint before the single corpus
remap.

Correctness must never depend on which leg fires — the min-label merge
is associative across any grouping of edges — so here we shrink the
bound far below the fixture's sizes (each epoch carries 281 contracted
edge rows; cumulative driver state peaks ~1.9k entries unbounded),
force EACH leg to fire (asserted via _CC_GATE_STATS, not inferred),
and require exact equality with the full batch recompute
(dedup_connected_components, itself pinned by the recursive-CTE
oracle).
"""
from __future__ import annotations

import pytest

from dig_aggregator_core_spark.operators import dedup as dedup_mod
from dig_aggregator_core_spark.operators.dedup import (
    dedup_connected_components,
)
from dig_aggregator_core_spark.streaming import stateful
from dig_aggregator_core_spark.streaming.stateful import stream_cc_incremental


def _rows(df):
    return sorted((r["doc_id"], r["component"]) for r in df.collect())


# bound=4 forces the over-bound DEFERRED epoch leg (281 > 4); bound=300
# lets epochs fold on the driver (281 <= 300) but trips the
# cumulative-state spill leg (lifetime bound = 4x, and driver state
# crosses 1200 entries across the two epochs — peak ~1.9k unbounded).
@pytest.mark.parametrize(
    "bound, must_fire", [(4, "distributed_epochs"), (300, "compactions")]
)
def test_stream_cc_bounded_state_equals_full_recompute(
    spark, sf_dir, monkeypatch, bound, must_fire
):
    monkeypatch.setattr(dedup_mod, "_DELTA_LOCAL_MAX", bound)
    got = _rows(stream_cc_incremental(spark, sf_dir))
    assert stateful._CC_GATE_STATS[must_fire] > 0, stateful._CC_GATE_STATS
    expect = _rows(dedup_connected_components(spark, sf_dir))
    assert got == expect
    assert len(got) > 0


def test_stream_cc_unbounded_path_unchanged(spark, sf_dir):
    """With the production bound (64k) the fixture never trips either
    leg — the pure driver-fold path must still equal the recompute."""
    got = _rows(stream_cc_incremental(spark, sf_dir))
    s = stateful._CC_GATE_STATS
    assert s["distributed_epochs"] == 0 and s["compactions"] == 0, s
    assert s["fold_epochs"] > 0
    expect = _rows(dedup_connected_components(spark, sf_dir))
    assert got == expect
