"""CC maintenance under node deletion (r12, dedup_cc_delete).

Deletion is the non-monotone direction: removing a node can SPLIT a
component, shift its min-id label, or dissolve it. The registered
query is pinned against the full-recompute oracle at both SFs by the
sweep; the fixture's near-dup components are clique-like and never
split, so the split path is pinned here on synthetic graphs through
the corpus-independent core (_cc_delete_maintain).
"""
from __future__ import annotations

import pyspark.sql.functions as F

from dig_aggregator_core_spark.operators.dedup import (
    _cc_delete_maintain,
    _cc_labels,
    _full_cc_labels,
    dedup_cc_delete,
)


def _maintain(spark, edge_list, deleted):
    edges = spark.createDataFrame(edge_list, "u bigint, v bigint")
    labels = _cc_labels(edges)
    out = _cc_delete_maintain(
        spark, edges, labels,
        spark.createDataFrame([(d,) for d in deleted], "u bigint"),
    )
    return sorted((r["u"], r["component"]) for r in out.collect())


def test_deleting_a_cut_node_splits_the_component(spark):
    # path 1-2-3-4-5; deleting 3 splits {1,2} from {4,5}
    got = _maintain(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [3])
    assert got == [(1, 1), (2, 1), (4, 4), (5, 4)]


def test_deleting_the_min_root_shifts_the_label(spark):
    # triangle 1-2-3: deleting 1 leaves {2,3} labeled by the new min
    got = _maintain(spark, [(1, 2), (2, 3), (1, 3)], [1])
    assert got == [(2, 2), (3, 2)]


def test_unaffected_components_keep_labels_verbatim(spark):
    # two components; deleting from one must not touch the other, and
    # a survivor isolated by the deletion leaves the graph
    got = _maintain(spark, [(1, 2), (10, 11), (11, 12)], [2])
    assert got == [(10, 10), (11, 10), (12, 10)]


def test_deleting_a_whole_component_dissolves_it(spark):
    got = _maintain(spark, [(1, 2), (10, 11)], [1, 2])
    assert got == [(10, 10), (11, 10)]


def test_corpus_query_equals_filtered_recompute(spark, sf_dir):
    got = sorted(
        (r["doc_id"], r["component"])
        for r in dedup_cc_delete(spark, sf_dir).collect()
    )
    # independent recompute: full CC over the pair graph minus the panel
    from dig_aggregator_core_spark.operators.dedup import _neardup_pairs

    edges = (
        _neardup_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(~F.expr("u % 7 = 2") & ~F.expr("v % 7 = 2"))
    )
    expect = sorted(
        (r["u"], r["component"]) for r in _cc_labels(edges).collect()
    )
    assert got == expect
    assert len(got) > 0
    # deletions really departed
    full = _full_cc_labels(spark, sf_dir)
    assert len(got) < full.count()
