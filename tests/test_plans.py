"""Plan-regression tests: assert the STRUCTURAL properties that make the
headline operators scale — filters pushed into the parquet scan, small
sides broadcast, shuffle-free ops actually shuffle-free, single-scan
fusions actually single-scan. Value correctness is the oracle suite's
job; these tests pin the physical shape so a future edit can't silently
trade a broadcast for a sort-merge join or re-introduce a second scan.

The assertions run against the pre-AQE formatted plan (AdaptiveSparkPlan
isFinalPlan=false) — the statically-chosen strategy, which is what would
ship to a real cluster's planner at scale.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from dig_aggregator_core_spark import registry

registry.load_all()


def n_shuffles(plan: str) -> int:
    """Count shuffle Exchange nodes via the formatted detail headers
    ("(n) Exchange") — substring counting would double-count the tree
    rendering and match BroadcastExchange."""
    return len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))


def plan_of(name: str, spark, sf_dir: str) -> str:
    df = registry.QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    plan = plan_of("q1_pricing_summary", spark, sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert n_shuffles(plan) == 1


def test_q6_full_pushdown(spark, sf_dir):
    plan = plan_of("q6_forecast_revenue", spark, sf_dir)
    assert "GreaterThanOrEqual(l_shipdate" in plan  # range reaches the scan
    assert "SortMergeJoin" not in plan


def test_delta_antijoin_broadcasts_ledger(spark, sf_dir):
    plan = plan_of("delta_antijoin", spark, sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_join_inner_dim_broadcasts(spark, sf_dir):
    plan = plan_of("join_inner_dim", spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_single_scan_fusion(spark, sf_dir):
    plan = plan_of("flagship_frequency", spark, sf_dir)
    # r3 fused the two measure pipelines: ONE lineitem scan, ONE supplier
    # scan, weights broadcast, no join between measures. Three exchanges
    # total: two fact-side aggregations plus the metadata-sized weights
    # aggregation feeding the broadcast.
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("supplier.parquet") == 1
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert n_shuffles(plan) == 3


def test_repetition_metrics_shuffle_free(spark, sf_dir):
    plan = plan_of("text_repetition_metrics", spark, sf_dir)
    assert "Exchange" not in plan
    assert "array_sort" in plan  # the per-row run-length fold survives


@pytest.mark.parametrize(
    "name", ["quantize_embeddings", "text_normalize_clean"]
)
def test_narrow_maps_shuffle_free(name, spark, sf_dir):
    assert "Exchange" not in plan_of(name, spark, sf_dir)


def test_decontam_broadcasts_benchmark(spark, sf_dir):
    plan = plan_of("decontam_ngram_overlap", spark, sf_dir)
    assert "BroadcastHashJoin" in plan  # corpus side never shuffled
    assert "SortMergeJoin" not in plan


def test_decontam_matrix_single_corpus_scan(spark, sf_dir):
    plan = plan_of("decontam_source_matrix", spark, sf_dir)
    # the whole source x benchmark grid costs the SAME two corpus reads
    # as the single-flag decontam_ngram_overlap (probe side + benchmark
    # side) — generalizing to the matrix adds no scan; no SMJ, and no
    # COUNT(DISTINCT) Expand (two-level agg instead)
    assert n_scans(plan) <= 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Expand" not in plan


def test_pack_token_chunks_single_exchange_no_global_sort(spark, sf_dir):
    plan = plan_of("pack_token_chunks", spark, sf_dir)
    # one per-source exchange; the window sort is per-partition
    # (global=false in Sort args), never a global ordering
    assert n_shuffles(plan) == 1


def test_k_per_group_uses_window_group_limit(spark, sf_dir):
    plan = plan_of("sample_k_per_group", spark, sf_dir)
    assert "WindowGroupLimit" in plan  # rank<=k pruned before the sort


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of("topk_orders", spark, sf_dir)
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_reservoir_sample_is_zero_shuffle(spark, sf_dir):
    # the distributed-reservoir contract: per-partition top-k heaps +
    # driver merge, NO exchange anywhere in the plan (r9)
    plan = plan_of("sample_reservoir_priority", spark, sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_registry_ordering_is_a_permutation(spark, sf_dir):
    # ordered_queries must cover every registered query exactly once —
    # a dropped or duplicated name silently shrinks harness coverage
    ordered = list(registry.ordered_queries())
    assert sorted(ordered) == sorted(registry.QUERIES)
    assert len(set(ordered)) == len(ordered)
    # verified/deferred sets must only name real queries (catch typos
    # when refreshing them each round)
    assert registry._VERIFIED_PRIOR_ROUNDS <= set(registry.QUERIES)
    assert registry._DEFER_TO_NEXT_ROUND <= set(registry.QUERIES)


def n_scans(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))


def test_table_profile_single_scan(spark, sf_dir):
    plan = plan_of("table_profile", spark, sf_dir)
    # all columns profile in ONE pass: one scan + Expand for the
    # multi-COUNT(DISTINCT), never one scan per column
    assert n_scans(plan) == 1
    assert "Expand" in plan


def test_snapshot_diff_copartitioned_full_outer(spark, sf_dir):
    plan = plan_of("snapshot_diff", spark, sf_dir)
    assert "FullOuter" in plan and "SortMergeJoin" in plan
    # both sides shuffle once on the key; no extra exchange after the join
    assert n_shuffles(plan) == 2


def test_perplexity_model_broadcasts(spark, sf_dir):
    plan = plan_of("text_perplexity_proxy", spark, sf_dir)
    # the bigram model is vocabulary-sized — it must broadcast back onto
    # the exploded corpus, never sort-merge it
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", ["layout_zorder_key", "fn_variant_json"])
def test_new_fns_stay_jvm_side(name, spark, sf_dir):
    plan = plan_of(name, spark, sf_dir)
    # pure column expressions: one aggregation shuffle, no Python workers
    assert n_shuffles(plan) == 1
    assert "Python" not in plan


def test_minhash_verify_broadcasts_candidates(spark, sf_dir):
    plan = plan_of("dedup_minhash_lsh", spark, sf_dir)
    # under-gate path: the verify stage must probe the heavy shingle
    # relation with the broadcast candidate set — a SortMergeJoin here
    # means the shingle arrays shuffle twice again (the measured
    # 1.98s->1.55s regression)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_verify_gate_drops_hint_when_over_threshold(spark, sf_dir):
    from dig_aggregator_core_spark.operators.dedup import dedup_minhash_lsh

    # over-gate path: the FORCED broadcast hint on the candidate set must
    # be gone from the logical plan — join strategy then belongs to the
    # cost model / AQE instead of a hardcoded hint that would OOM the
    # driver at extreme dup rates (the self-protecting 100 TB escape;
    # VERDICT r6 task 3). At sf0.01 the physical plan still broadcasts —
    # by ESTIMATE, which is exactly the point — so pin the analyzed plan.
    over = dedup_minhash_lsh(spark, sf_dir, cand_gate=-1)
    assert "ResolvedHint" not in over._jdf.queryExecution().analyzed().toString()
    under = registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    assert "ResolvedHint" in under._jdf.queryExecution().analyzed().toString()


def test_ewma_single_shuffle(spark, sf_dir):
    plan = plan_of("timeseries_ewma", spark, sf_dir)
    # collect + fold is one exchange on the entity key, nothing more
    assert n_shuffles(plan) == 1
    assert "Python" not in plan


def test_interval_bucketed_is_hash_join(spark, sf_dir):
    plan = plan_of("join_interval_bucketed", spark, sf_dir)
    # the whole point of the bucket rewrite: an equi hash join, not the
    # nested loop the raw interval predicate would produce
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skew_diagnostic_topk_pruned(spark, sf_dir):
    plan = plan_of("skew_diagnose_keys", spark, sf_dir)
    assert "TakeOrderedAndProject" in plan  # LIMIT k without a global sort


def test_user_features_pipeline_single_user_shuffle(spark, sf_dir):
    plan = plan_of("pipeline_user_features", spark, sf_dir)
    # the session lag-window and the final per-user agg must share one
    # user_id exchange; the stat joins must broadcast (group-count-sized)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert (
        len(re.findall(r"hashpartitioning\(user_id", plan)) > 0
        and plan.count("Exchange hashpartitioning(user_id") <= 1
    )


def test_chunking_shuffle_free(spark, sf_dir):
    # sequence+transform+posexplode chunking is a pure map: any Exchange
    # means someone re-introduced a shuffle into a per-row generator
    assert "Exchange" not in plan_of("doc_chunk_overlap", spark, sf_dir)


def test_bpe_pairs_single_exchange_heap_topk(spark, sf_dir):
    plan = plan_of("bpe_pair_stats", spark, sf_dir)
    # double explode stays map-side; only the alphabet^2-bounded pair
    # count exchanges, and the top-k is a heap, not a global sort
    assert n_shuffles(plan) == 1
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_bm25_broadcasts_stats_heap_topk(spark, sf_dir):
    plan = plan_of("bm25_topk", spark, sf_dir)
    # the 1-row corpus-stats side must broadcast (BroadcastNestedLoopJoin
    # over a single row is fine); the top-k must be a heap
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_profile_drift_single_scan_single_exchange(spark, sf_dir):
    plan = plan_of("profile_drift", spark, sf_dir)
    # both snapshot halves profile as conditional aggs in ONE pass
    assert n_scans(plan) == 1
    assert n_shuffles(plan) == 1


def test_funnel_single_user_shuffle(spark, sf_dir):
    plan = plan_of("funnel_conversion", spark, sf_dir)
    # per-user fold: one user_id exchange + the 1-row final reduction
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1
    assert n_shuffles(plan) == 2
    assert "Python" not in plan


def test_cohort_single_user_exchange(spark, sf_dir):
    plan = plan_of("cohort_retention", spark, sf_dir)
    # cohort min and activity days both come from ONE user_id aggregate;
    # a (user, day)-keyed distinct before the window would add a second
    # user-derived exchange. Grid reduction is the only other shuffle.
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1
    assert n_shuffles(plan) == 2
    # grid count must partial-aggregate: no distinct Expand
    assert "Expand" not in plan


def test_simjoin_narrow_prefix_join(spark, sf_dir):
    plan = plan_of("simjoin_prefix_jaccard", spark, sf_dir)
    # shingles are xxhash64 bigints everywhere downstream of the scan —
    # a join keyed on raw shingle STRINGS would re-widen every shuffle
    assert "xxhash64" in plan
    assert "Python" not in plan


def test_table_profile_approx_no_expand_on_sketch_side(spark, sf_dir):
    plan = plan_of("table_profile_approx", spark, sf_dir)
    # the sketch aggregation must stay Expand-free and sketch state must
    # be DataSketches binary buffers (hll_sketch_agg), never the
    # register-per-attribute approx_count_distinct form whose codegen
    # explodes at tight rsd; the only Expand allowed is the evidence-only
    # exact-distinct aggregation (its own pass, crossJoined back)
    assert "hll_sketch_agg" in plan
    assert "approx_count_distinct" not in plan


@pytest.mark.parametrize(
    "name", ["quality_classifier_score", "entropy_filter"]
)
def test_quality_ops_shuffle_free(name, spark, sf_dir):
    # model inference / entropy fold are pure per-row projections; the
    # one allowed Exchange is entropy_filter's under-partitioned-scan
    # spread (r12 batch 6 — a no-op at real scale), never an aggregation
    # or join shuffle
    plan = plan_of(name, spark, sf_dir)
    assert n_shuffles(plan) <= (1 if name == "entropy_filter" else 0)
    assert "BroadcastExchange" not in plan
    assert "Python" not in plan


def test_semdedup_no_wide_window(spark, sf_dir):
    plan = plan_of("semdedup_clusters", spark, sf_dir)
    # centroid assignment must be the partial-aggregated max_by, never a
    # ranking window dragging embedding arrays through a per-vector sort
    assert "row_number" not in plan
    assert "partial_max" in plan or "max(" in plan
    assert "BroadcastExchange" in plan  # centroid table broadcast


def test_bootstrap_generation_stays_mapside(spark, sf_dir):
    plan = plan_of("bootstrap_confidence", spark, sf_dir)
    # replica explode is map-side; the only exchanges are the
    # (group, replica) partial agg, the per-group collect, and the
    # under-partitioned-scan spread guard
    assert "Generate" in plan and "explode" in plan
    assert n_shuffles(plan) <= 3


def test_bpe_apply_shuffle_free(spark, sf_dir):
    # the whole encoder is one projection — the only allowed Exchange is
    # the under-partitioned-scan spread (tables.maybe_spread; one cheap
    # raw-text shuffle bought a measured 7x on the fold, r6). Any Python
    # node means someone broke the codegen fold.
    # Pin the COLD derivation: since the r11 bounded memo policy, the
    # _BPE_ENC_CACHE entry survives earlier test files, and explaining
    # the memo HIT renders the persisted relation's STORED subtree
    # (whose formatted form counts extra Exchange detail nodes even
    # though a hit executes zero shuffles) — clear it so the pin
    # measures the op's own plan regardless of session history.
    from dig_aggregator_core_spark.operators import training

    for k in list(training._BPE_ENC_CACHE):
        training._BPE_ENC_CACHE.pop(k).unpersist()
    plan = plan_of("tokenizer_bpe_apply", spark, sf_dir)
    assert n_shuffles(plan) <= 1
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_ann_rerank_bucket_confined(spark, sf_dir):
    # the coarse stage must stay an equi-join on the probed bucket key;
    # the only nested-loop is the 1-row bit-count broadcast
    plan = plan_of("ann_rerank_quantized", spark, sf_dir)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # exactly the two 1-row bit-count broadcasts (query side + corpus
    # side), counted by detail header so tree rendering doesn't double
    assert len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin$", plan, re.M)) <= 2
    assert "CartesianProduct" not in plan


def test_quality_drift_single_scan(spark, sf_dir):
    # global baseline re-aggregates the per-source partials: documents
    # is scanned exactly once
    plan = plan_of("quality_drift_by_source", spark, sf_dir)
    assert plan.count("documents.parquet") == 1


def test_record_linkage_blocked_equi_join(spark, sf_dir):
    # pair generation must be an equi-join on the blocking key, never a
    # cartesian pair enumeration
    plan = plan_of("record_linkage_score", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_url_canonicalize_single_shuffle(spark, sf_dir):
    # exact-dedup shape: one groupBy exchange on the canonical key, and
    # the canonicalizer itself is pure projection (no Python, no joins)
    plan = plan_of("dedup_url_canonicalize", spark, sf_dir)
    assert n_shuffles(plan) == 1
    assert "EvalPython" not in plan and "Join" not in plan


def test_dsir_scoring_pass_is_mapside_fold(spark, sf_dir):
    # the per-doc scoring pass must be a codegen array fold against the
    # broadcast literal ratio map — no join, no Python, and the only
    # shuffle in the whole plan is the B-bounded bucket-stats aggregation
    # consumed by the driver-side collect (which is not part of THIS
    # plan), so the returned DataFrame's plan has zero shuffles beyond
    # the threshold aggregate's single-partition exchange
    plan = plan_of("dsir_importance_select", spark, sf_dir)
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row threshold frame
    # scoring + threshold: documents scanned exactly twice (score pass +
    # threshold pass), never more
    assert plan.count("documents.parquet") == 2


def test_curriculum_no_global_sort(spark, sf_dir):
    # curriculum order must NEVER be a corpus-wide sort: the only Sort
    # nodes are inside (phase, shard)-partitioned windows
    plan = plan_of("curriculum_order", spark, sf_dir)
    for m in re.finditer(r"^\(\d+\) Sort$\n(?:^\[.*$\n)*?^Arguments: (.*)$", plan, re.M):
        assert "global=false" in m.group(1) or "false" in m.group(1)
    assert "row_number" in plan


def test_token_budget_windows_are_metadata_sized(spark, sf_dir):
    # the waterfilling windows run over the |sources|-row aggregate; the
    # doc-side work is one broadcast join + one per-source window —
    # documents scanned exactly twice (source totals + selection pass)
    plan = plan_of("token_budget_allocation", spark, sf_dir)
    assert plan.count("documents.parquet") == 2
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_ann_index_persist_prunes_partitions(spark, sf_dir):
    # the index scan must carry a static PartitionFilters IN-list over the
    # bucket partition column — directory-level pruning, not a post-scan
    # filter; that is the entire point of persisting the index
    plan = plan_of("ann_index_persist", spark, sf_dir)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "index scan lost its PartitionFilters"
    assert "pbucket" in m.group(1) and "IN (b" in m.group(1)


def test_corpus_datacard_single_scan(spark, sf_dir):
    # the release grid must come from ONE corpus scan (Expand for the two
    # exact distincts is allowed, a second scan is not)
    plan = plan_of("corpus_datacard", spark, sf_dir)
    assert plan.count("documents.parquet") == 1
    assert "Expand" in plan  # exact countDistinct pair, table_profile twin


def test_leakage_audit_inherits_blocked_join(spark, sf_dir):
    # the audit must ride dedup_ngram_jaccard's blocked equi-join — a
    # regression to a cartesian pair enumeration would be quadratic
    plan = plan_of("split_leakage_audit", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_error_no_cartesian(spark, sf_dir):
    # candidates come from the band-bucket equi-join; signature/shingle
    # re-joins are hash joins on doc_id
    plan = plan_of("minhash_estimate_error", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_assoc_rules_single_events_shuffle(spark, sf_dir):
    # raw events shuffle once (basket build); pair counts come from
    # exploded array combinations of the baskets, never a basket
    # self-join re-shuffle
    plan = plan_of("assoc_rules_pairs", spark, sf_dir)
    assert plan.count("events.parquet") == 1
    assert "SortMergeJoin" not in plan


def test_bucketed_partitioned_sink_zero_exchange_join(spark, sf_dir):
    # the entire point of the bucketed+partitioned layout: the re-read
    # join runs with NO exchange on either fact table (the only shuffle
    # in the plan is the final groupBy on priority), and the returnflag
    # predicate prunes at the directory level, not post-scan
    plan = plan_of("sink_bucketed_partitioned_write", spark, sf_dir)
    assert "SortMergeJoin" in plan
    assert n_shuffles(plan) == 1, plan
    assert plan.count("Bucketed: true") == 2, "a scan lost its bucketing"
    m = re.search(r"PartitionFilters: \[([^\]]*l_returnflag[^\]]*)\]", plan)
    assert m, "lineitem scan lost directory-level partition pruning"


def test_asof_forward_single_user_shuffle(spark, sf_dir):
    # forward as-of must stay the union+window engine: one user_id
    # exchange feeding one window sort — never a range join
    plan = plan_of("asof_join_forward", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert n_shuffles(plan) <= 2, plan


def test_kn_bigram_single_corpus_scan(spark, sf_dir):
    # the corpus collapses to the checkpointed bigram type table in ONE
    # scan (it runs at checkpoint time, so the final plan reads the
    # materialized table and must contain NO corpus scan at all); the
    # un-checkpointed draft re-embedded the scan once per stats consumer
    plan = plan_of("lm_kneser_ney_bigram", spark, sf_dir)
    assert plan.count("documents.parquet") == 0


def test_rake_no_token_explode_of_corpus(spark, sf_dir):
    # phrase vocabulary is checkpointed (word-level work runs over the
    # vocabulary, never the corpus), so the final plan reads it with no
    # corpus scan; top-k is order+limit, never a global sort
    plan = plan_of("text_keyword_rake", spark, sf_dir)
    assert plan.count("documents.parquet") == 0
    assert "TakeOrderedAndProject" in plan


def test_welch_single_scan_moment_reduction(spark, sf_dir):
    # one events scan -> per-group exact moments; the control row is a
    # window splice over the |groups|-row aggregate, never a second scan
    plan = plan_of("stats_welch_ttest", spark, sf_dir)
    assert n_scans(plan) == 1
    assert n_shuffles(plan) <= 2, plan


def test_mann_whitney_histogram_first(spark, sf_dir):
    # ranks come from the checkpointed cents histogram: ONE corpus scan,
    # and every downstream relation is |domain|-bounded
    plan = plan_of("stats_mann_whitney_u", spark, sf_dir)
    assert n_scans(plan) <= 1  # 0 when the checkpoint absorbs the scan
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 5, plan


def test_moving_median_single_user_exchange(spark, sf_dir):
    plan = plan_of("window_moving_median", spark, sf_dir)
    assert n_scans(plan) == 1
    assert n_shuffles(plan) == 1, plan


def test_interval_coalesce_shares_one_exchange(spark, sf_dir):
    # both windows and the island group-by stack on ONE user_id exchange
    plan = plan_of("interval_coalesce", spark, sf_dir)
    assert n_scans(plan) == 1
    assert n_shuffles(plan) == 1, plan


def test_cusum_shares_series_exchange(spark, sf_dir):
    # cumsum/total/rownum/argmax windows all ride the event_type exchange
    plan = plan_of("timeseries_changepoint_cusum", spark, sf_dir)
    assert n_scans(plan) == 1
    assert n_shuffles(plan) <= 1, plan


def test_t_closeness_grid_only_aggregation(spark, sf_dir):
    # the corpus scan is absorbed by the cell-grid checkpoint; everything
    # in the live plan re-aggregates grid-sized relations
    plan = plan_of("privacy_t_closeness", spark, sf_dir)
    assert n_scans(plan) == 0
    assert n_shuffles(plan) <= 3, plan


def test_bleu_no_pair_self_join(spark, sf_dir):
    # the clip computation must be the side-conditional aggregation form:
    # no cand x ref self-join, gram rows shuffled once then rolled up
    plan = plan_of("eval_bleu_ngram_precision", spark, sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 3, plan


def test_wordpiece_single_spread_exchange(spark, sf_dir):
    # the encoder is one codegen projection: the only exchange is the
    # maybe_spread small-file repartition, and no Python anywhere
    plan = plan_of("tokenizer_wordpiece_apply", spark, sf_dir)
    assert n_shuffles(plan) <= 1, plan
    assert "Python" not in plan  # the fold is JVM higher-order exprs


def test_neighborhood_2hop_equi_joins_only(spark, sf_dir):
    # FoF must stay hash/sort equi joins on node keys — no cartesian,
    # and the edge relation is checkpointed (0 live scans)
    plan = plan_of("graph_neighborhood_2hop", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert n_shuffles(plan) <= 6, plan


def test_kappa_grid_only(spark, sf_dir):
    # one scan absorbed by the confusion-grid checkpoint; marginals and
    # chance term are grid re-aggregations, output is one row
    plan = plan_of("eval_cohens_kappa", spark, sf_dir)
    assert n_scans(plan) == 0
    assert n_shuffles(plan) <= 4, plan


def test_target_encoding_single_category_exchange(spark, sf_dir):
    # unordered partition windows: one exchange, no sort frame required
    plan = plan_of("feature_target_encoding_loo", spark, sf_dir)
    assert n_scans(plan) == 1
    assert n_shuffles(plan) == 1, plan


def test_kcore_rounds_checkpointed(spark, sf_dir):
    # per-round lineage is cut by localCheckpoint: the live plan carries
    # only the final degree aggregation, not R compounded join trees
    plan = plan_of("graph_kcore_decompose", spark, sf_dir)
    assert n_scans(plan) == 0
    assert n_shuffles(plan) <= 1, plan
    assert "CartesianProduct" not in plan


def test_asof_tolerance_stays_union_window(spark, sf_dir):
    # same engine as asof_join: union + window, never a range join
    plan = plan_of("asof_join_tolerance", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert n_shuffles(plan) <= 2, plan


def test_holt_single_series_exchange(spark, sf_dir):
    # collect + vector-state fold: one exchange on the series key
    plan = plan_of("timeseries_holt_linear", spark, sf_dir)
    assert n_scans(plan) == 1
    assert n_shuffles(plan) == 1, plan
    assert "Python" not in plan


def test_phonetic_key_no_pairwise_join(spark, sf_dir):
    # blocking must never enumerate pairs: key projection + aggregation
    plan = plan_of("dedup_phonetic_key", spark, sf_dir)
    assert "Join" not in plan
    assert n_shuffles(plan) <= 2, plan
    assert "Python" not in plan


def test_spearman_grid_only(spark, sf_dir):
    # ranks come from the checkpointed joint histogram: 0 live scans,
    # every downstream relation is |domain|-bounded; no pairwise join
    plan = plan_of("stats_spearman_corr", spark, sf_dir)
    assert n_scans(plan) == 0
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 6, plan


def test_fdr_bh_histogram_first(spark, sf_dir):
    # KS statistics ride the checkpointed cents grid (the MWU device);
    # the BH ranking windows run over the |variants|-row test table
    plan = plan_of("stats_fdr_bh", spark, sf_dir)
    assert n_scans(plan) == 0
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 6, plan


def test_mutual_information_grid_only(spark, sf_dir):
    # ONE corpus scan absorbed by the joint-grid checkpoint; marginals
    # are window sums over the grid, output is one row
    plan = plan_of("feature_mutual_information", spark, sf_dir)
    assert n_scans(plan) == 0
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 5, plan


def test_acf_daily_grid_lag_join(spark, sf_dir):
    # the daily series grid is checkpointed (one corpus scan at build);
    # the lag spine is broadcast; alignment is an equi join on the grid
    plan = plan_of("timeseries_acf", spark, sf_dir)
    assert n_scans(plan) == 0
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 2, plan


def test_rouge_no_pair_self_join(spark, sf_dir):
    # same side-conditional aggregation shape as BLEU: no cand x ref
    # self-join, gram rows shuffled once then rolled up
    plan = plan_of("eval_rouge_n_recall", spark, sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 3, plan


def test_adamic_adar_equi_joins_only(spark, sf_dir):
    # doubly-capped adjacency is checkpointed (0 live scans); candidate
    # generation and scoring are equi joins on node keys, never cartesian
    plan = plan_of("link_prediction_adamic_adar", spark, sf_dir)
    assert n_scans(plan) == 0
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert n_shuffles(plan) <= 10, plan


def test_star_contraction_single_exchange_per_star(spark, sf_dir):
    # each star attaches the closed-neighborhood minimum with ONE
    # window-min over the node key — a regression back to the
    # groupBy + self-join form would show a Join node and a second
    # exchange per star (the r7 A/B measured that form 23% slower)
    import pyspark.sql.functions as F
    from dig_aggregator_core_spark.operators.dedup import (
        _large_star,
        _small_star,
    )
    import io
    from contextlib import redirect_stdout

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "u bigint, v bigint"
    ).localCheckpoint()
    for star in (_large_star, _small_star):
        buf = io.StringIO()
        with redirect_stdout(buf):
            star(edges).explain("formatted")
        plan = buf.getvalue()
        assert "Window" in plan, plan
        assert "Join" not in plan, plan
        # symmetrize/orient distinct + window key + trailing distinct
        assert n_shuffles(plan) <= 3, plan


def test_lcc_corner_credit_is_single_generate(spark, sf_dir):
    # triangle corners are credited via one explode (Generate) over the
    # 3-way edge join — the unionAll-of-projections form repeated the
    # join probe three times (r7 A/B: 8.8s -> 7.9s at sf0.1)
    plan = plan_of("graph_clustering_coefficient", spark, sf_dir)
    assert "Union" not in plan, plan
    assert plan.count("Generate") >= 1, plan
