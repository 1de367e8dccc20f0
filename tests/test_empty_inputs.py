"""Operators must degrade to empty results — not crash — on empty inputs.

At 100 TB empty slices are routine (an empty date partition, a source with
no new batch, a filter that matches nothing). Every operator here runs
against a schema-identical but 0-row copy of the fixture tables and must
produce a well-formed (possibly empty) result. Guards the family of bugs
where element_at/head/first/min on an empty relation, or a fold seeded
from a first element that doesn't exist, throws at runtime.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from dig_aggregator_core_spark import registry
from dig_aggregator_core_spark.tables import TABLES, load

registry.load_all()

# one representative per newly-added family; older families have their own
# empty-relation coverage (empty_relation query, StageTest ports)
EMPTY_SAFE = [
    "snapshot_diff",
    "table_profile",
    "text_perplexity_proxy",
    "dedup_exact_substring",
    "dedup_incremental_ledger",
    "timeseries_ewma",
    "feature_mad_outliers",
    "skew_diagnose_keys",
    "agg_mode_per_group",
    "join_interval_bucketed",
    "layout_zorder_key",
    "hll_sketch_union_bounded",
    "sample_weighted_without_replacement",
    "pipeline_user_features",
    # r4 additions
    "funnel_conversion",
    "cohort_retention",
    "bm25_topk",
    "simjoin_prefix_jaccard",
    "bpe_pair_stats",
    "doc_chunk_overlap",
    "profile_drift",
    "ann_lsh_adaptive",
    "semdedup_clusters",
    "bootstrap_confidence",
    "sample_group_kfold",
    "quality_classifier_score",
    "entropy_filter",
    "length_bucket_batching",
    "tokenizer_bpe_merges",
    # r6 additions
    "asof_join_forward",
    "graph_bfs_distance",
    "eval_f1_confusion",
    "dpo_pair_assembly",
    "text_keyword_rake",
    "lm_kneser_ney_bigram",
    "feature_quantile_normalize_approx",
    "tokenizer_vocab_coverage",
    # r6b additions
    "stats_welch_ttest",
    "stats_mann_whitney_u",
    "window_moving_median",
    "interval_coalesce",
    "timeseries_changepoint_cusum",
    "privacy_t_closeness",
    "graph_neighborhood_2hop",
    "eval_bleu_ngram_precision",
    "tokenizer_wordpiece_apply",
    "eval_cohens_kappa",
    "feature_target_encoding_loo",
    "graph_kcore_decompose",
    "asof_join_tolerance",
    "timeseries_holt_linear",
    "dedup_phonetic_key",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir) -> str:
    out = os.path.join(tempfile.gettempdir(), "spark_graft_scratch", "empty_sf")
    for t in TABLES:
        # tables.load, not a bare spark.read.parquet: it owns the ts-dtype
        # branches (nanosAsLong for NANOS fixtures, NTZ passthrough), so
        # this fixture can't silently depend on another test having set a
        # legacy conf on the shared session first
        df = load(spark, sf_dir, t)
        df.limit(0).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_empty_input_yields_empty_result(name, spark, empty_sf_dir):
    df = registry.QUERIES[name](spark, empty_sf_dir)
    rows = df.collect()  # must not raise
    assert df.schema is not None
    if name == "funnel_conversion":
        # the funnel legitimately keeps its 3 stage rows, all at zero
        assert len(rows) == 3 and all(r.n_users == 0 for r in rows)
    elif name == "table_profile":
        # a profile of an empty table legitimately reports every profiled
        # column — with zero counts
        assert len(rows) == 4 and all(r.n_rows == 0 for r in rows)
    else:
        # aggregations over empty input may legally emit 0 rows or a single
        # all-null/zero summary row; anything larger means phantom data
        assert len(rows) <= 1
