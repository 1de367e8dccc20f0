"""IVF+PQ recall contract (VERDICT r9 task 4): cell confinement must not
cost recall vs the flat ADC scan it replaces.

At _IVFPQ_NPROBE=6 of 32 cells the composed op matches the flat-ADC
baseline exactly on the sf0.01 panel (both 0.80 vs exact top-5); the
sweep behind the constant is in the _IVFPQ_NPROBE comment. The floor
guards a silently-empty probe set, the dominance check guards the
composition."""

from __future__ import annotations

from dig_aggregator_core_spark.operators.similarity import (
    ann_ivf_pq,
    ann_pq_adc,
    ann_topk_bruteforce,
)

SF_DIR = "/root/testdata/sf0.01"


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx, exact) -> float:
    hits = sum(len(approx.get(q, set()) & nb) for q, nb in exact.items())
    total = sum(len(nb) for nb in exact.values())
    return hits / total if total else 1.0


def test_ivf_pq_recall_matches_flat_adc(spark):
    exact = _topk_sets(ann_topk_bruteforce(spark, SF_DIR))
    flat = _recall(_topk_sets(ann_pq_adc(spark, SF_DIR)), exact)
    composed = _recall(_topk_sets(ann_ivf_pq(spark, SF_DIR)), exact)
    assert composed >= flat, (composed, flat)
    assert composed >= 0.6, composed  # absolute floor (measured 0.80)


def test_ivf_pq_trained_recall_matches_flat_adc(spark):
    """The trained-quantizer composition at its shipped nprobe matches
    the flat baseline (measured 0.80 == 0.80 on this panel); the floor
    guards a silently-empty probe set."""
    from dig_aggregator_core_spark.operators.similarity import (
        ann_ivf_pq_trained,
    )

    exact = _topk_sets(ann_topk_bruteforce(spark, SF_DIR))
    flat = _recall(_topk_sets(ann_pq_adc(spark, SF_DIR)), exact)
    trained = _recall(_topk_sets(ann_ivf_pq_trained(spark, SF_DIR)), exact)
    assert trained >= flat - 0.05, (trained, flat)
    assert trained >= 0.7, trained
