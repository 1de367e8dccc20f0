"""Plan lint: sweep every registered query's pre-AQE physical plan for
scale anti-patterns. Complements tests/test_plans.py (which pins named
queries' shapes exactly): this is the broad screen that catches a
regression in any of the other ~180 plans.

Flags (with a per-query allowlist for the deliberate exceptions):
- CartesianProduct / BroadcastNestedLoopJoin — quadratic unless the
  broadcast side is provably tiny (1-row stats frames, bounded dims).
- PythonUDF / ArrowEvalPython / MapInPandas etc. — Python in the plan;
  allowed only for ops whose POINT is the vectorized-UDF path.
- "Sort [global=true" outside TakeOrderedAndProject — a full global sort.
- Exchange count above a threshold — shuffle-heavy plan drift.

Usage: python tools/planlint.py [name ...]
Exit 1 on any unallowlisted finding.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dig_aggregator_core_spark import registry  # noqa: E402
from dig_aggregator_core_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")

# queries whose plan legitimately contains the pattern, with the reason
ALLOW: dict[str, dict[str, str]] = {
    "nested_loop": {
        "ann_topk_bruteforce": "the documented exact-recall yardstick; query side broadcast",
        "join_cross_product": "the operator IS a (bounded) cross join",
        "bm25_topk": "1-row corpus-stats frame broadcast onto the scan",
        "table_profile_approx": "1-row evidence frame (exact distinct) crossJoined back",
        "feature_quantile_bucketize": "1-row quantile-cuts frame broadcast",
        "feature_winsorized_stats": "1-row percentile-clamp frame broadcast",
        "range_join_bands": "band predicate rides a broadcast non-equi join by design",
        "decontam_ngram_overlap": "tiny benchmark shingle set, non-equi containment probe",
        "dedup_exact_substring": "1-row corpus-stats frame broadcast",
        "text_perplexity_proxy": "1-row vocab-size frame broadcast",
        "stats_agg": "1-row global-stats frame joined back",
        "stats_correlation": "1-row moments frame joined back",
        "mixture_weighted_sample": "per-source rate frame (sources-sized) broadcast",
        "scalar_subquery_avg": "scalar subquery is a 1-row broadcast by definition",
        "q11_important_stock": "scalar threshold subquery, 1 row",
        "q22_global_sales": "scalar avg subquery, 1 row",
        "skew_diagnose_keys": "total-count 1-row frame joined back",
        "epoch_shard_assignment": "1-row corpus-count frame broadcast",
        "sample_weighted_without_replacement": "per-stratum weight-sum frame, strata-sized",
        "hll_sketch_union_bounded": "1-row exact-distinct evidence frame",
        "approx_top_k_bounded": "exact top-k evidence frame, k rows",
        "percentile_approx_bounded": "exact percentile evidence frame, 1 row",
        "approx_count_distinct_bounded": "1-row exact-distinct evidence frame",
        "agg_mode_per_group": "group-count-sized tie-break frame",
        "snapshot_diff": "keyless row-number seam: bounded seam frame",
        "interleave_sources": "per-source count frame, sources-sized",
        "pack_token_chunks": "per-source chunk-offset frame, sources-sized",
        "pack_chunk_texts": "per-source chunk-offset frame, sources-sized",
        "kmeans_embeddings": "k x dim centroid matrix broadcast each iteration",
        "pagerank_transitions": "node-count scalar frame per power iteration",
        "graph_triangle_count": "1-row totals frame",
        "dedup_incremental_ledger": "1-row batch-watermark frame",
        "funnel_conversion": "3-row stage frame exploded from the 1-row reduction",
        "table_profile": "1-row profile frame unpivoted via stack",
        "text_tfidf_topterm": "1-row doc-count frame broadcast (idf)",
        "cube_agg": "1-row grand-total frame",
        "window_running_distinct": "1-row seam frame for the running-distinct splice",
        "join_salted_skew": "salt replication = cross join with the FACTOR-sized literal salt range",
        "ann_ivf_probe": "k-row centroid table crossed for assignment + probe scoring",
        "ann_pq_adc": "1-row codebook frame (16x64 ints) broadcast-crossed onto corpus + queries; ADC itself is an equi-join on (m, code)",
        "ann_ivf_pq": "k-row centroid table + 1-row codebook frame broadcast-crossed (the ann_ivf_probe + ann_pq_adc devices); ADC is an equi-join on (cent_id, m, code)",
        "ann_ivf_pq_trained": "K=4 trained centroid frame + 1-row codebook frame broadcast-crossed; ADC fold joins on the cell key",
        "mmr_diversified_topk": "1-row adaptive-width frame broadcast-crossed (the ann_lsh_buckets device); candidate/sim joins are equi on query_id",
        "semdedup_clusters": "metadata-sized seed-centroid table broadcast for assignment",
        "ann_lsh_adaptive": "1-row bucket-bit-count frame broadcast onto the corpus",
        "dedup_embedding_cosine": "1-row adaptive-width frame broadcast onto the corpus (r10; the ann_lsh_adaptive device)",
        "ann_lsh_buckets": "1-row bucket-bit-count frame broadcast onto the corpus (same plan as ann_lsh_adaptive since r7)",
        "ann_rerank_quantized": "1-row bucket-bit-count frame broadcast onto the corpus",
        "quality_drift_by_source": "1-row global-baseline frame re-aggregated from per-source partials",
        "stats_ks_drift": "1-row sample-totals frame joined onto the bin histogram",
        "tokenizer_unigram_em_step": "1-row piece-total frame broadcast for the micro-nat renormalization",
        "feature_fit_transform_persist": "1-row persisted cut table broadcast onto the eval split (the TRANSFORM half)",
        "privacy_dp_quantile": "1-row selected-bin frame crossed with the 1-row true-median audit frame",
        "eval_pass_at_k_ci": "1-row corpus-stats frame crossed with the 1-row sorted-replica-means frame",
        "negative_sampling_recsys": "1-row catalog-count frame broadcast for hash-draws",
        "ann_lsh_multiprobe": "1-row bucket-bit-count frame broadcast onto the corpus",
        "ann_hard_negatives": "1-row bucket-bit-count frame broadcast onto the corpus",
        "knn_centroid_label_eval": "labels x dim centroid table broadcast for scoring",
        "mixture_temperature_reweight": "1-row normalizer frame onto the sources frame",
        "text_cooccurrence_pmi": "1-row (n_tok, n_pairs) totals frame broadcast",
        "stats_chi2_independence": "1-row grand-total frame onto the contingency grid",
        "dsir_importance_select": "1-row selection-threshold frame broadcast onto scored docs",
        "curriculum_order": "1-row difficulty-quartile-cuts frame broadcast",
        "ann_recall_eval": "inherits the brute-force ground-truth side (the exact-recall yardstick)",
        "engagement_dau_wau": "7-day band join against the |days|-row broadcast spine",
        "feature_quantile_normalize": "1-row corpus-count frame broadcast for the rank-index map",
        "join_cardinality_probe": "two 1-row estimate/actual frames crossed for the report row",
        "dq_constraint_audit": "five 1-row violation/total report frames crossed per check",
        "sample_class_balance": "1-row min-class-size frame broadcast onto the ranked docs",
        "dedup_threshold_sweep": "5-row threshold spine crossed with the verified-pair relation",
        "eval_mrr_map": "1-row bucket-bit-count frame broadcast onto the corpus (inherits ann_lsh_adaptive)",
        "cms_frequency_estimate": "vocab grid crossed with the CMS_D-row literal hash-row spine",
        "feature_quantile_normalize_approx": "1-row (approx grid, exact band) frame broadcast onto ranked docs",
        "lm_kneser_ney_bigram": "1-row bigram-type-total frame broadcast for continuation probs",
        "ann_index_persist": "1-row bucket-bit-count frame broadcast (inherits ann_lsh_adaptive)",
        "eval_rank_fusion_rrf": "query panel broadcast against the corpus (inherits the ann_topk_bruteforce yardstick shape)",
        "feature_rfm_segmentation": "1-row study-end anchor frame broadcast onto the user table",
        "graph_degree_assortativity": "1-row node-count frame crossed onto the 1-row moment frame",
        "stats_kruskal_wallis": "1-row tie-correction frame crossed onto the 1-row moment frame",
        "sample_stratified_neyman": "1-row weight-total and leftover frames crossed onto the k-row strata grid",
        "timeseries_ljung_box": "7-row lag spine crossed onto the calendar-bounded daily grid (the ACF device)",
        "timeseries_cross_correlation": "15-row lag spine crossed onto the calendar-bounded daily grid (the ACF device)",
        "stats_tost_equivalence": "1-row control-moments frame crossed onto the |types|-row variant grid",
        "spatial_join_radius": "3x3 literal cell-offset spine crossed onto the SITE side (the salted-join replication shape); the point join itself is equi on the cell key",
        "eval_ndcg_at_k": "1-row bucket-bit-count frame broadcast (inherits ann_lsh_adaptive)",
        "stats_mann_whitney_u": "|domain|-row control histogram crossed onto the |groups| spine",
        "privacy_t_closeness": "|langs|-row global-distribution frame + 1-row grand total crossed onto the class grid",
        "eval_cohens_kappa": "1-row chance-agreement frame crossed with the 1-row totals frame",
        "stats_fdr_bh": "|domain|-row control histogram crossed onto the |variants| spine (inherits stats_mann_whitney_u)",
        "timeseries_acf": "7-row lag spine broadcast-crossed onto the |groups|x|days| daily grid",
    },
    "python": {
        "text_langid": "the designated Arrow mapInPandas showcase",
        "sink_webdataset_shards": "tar packing/parsing IS the operator — no JVM form; applyInPandas write + mapInPandas read-back",
        "quality_compression_ratio": "the codec IS the operator — zlib has no SQL form; Arrow-batched",
        "udaf_pandas_geomean": "the designated grouped-agg pandas UDAF",
        "mm_decode_features": "multimodal decode is Pandas-UDF plumbing by brief",
        "mm_frame_sample": "multimodal frame sampling, mapInPandas by brief",
        "mm_binary_meta": "binary metadata extraction, Arrow batch path",
        "mapinarrow_vector_norm": "the designated mapInArrow showcase",
        "udtf_sentence_split": "the designated Python UDTF showcase",
        "scan_python_datasource": "a Python DataSource necessarily runs Python readers",
        "stream_ewma_stateful": "applyInPandasWithState stateful op",
    },
    "global_sort": {
        "sink_compacted_write": "repartitionByRange for the clustered layout — the op's point",
        "layout_zorder_key": "range partition by Morton key is the clustering device",
        "epoch_shard_assignment": "within-shard hash order is emitted for determinism proof",
        "window_running_distinct": "ordered seam splice over the running window",
        "timeseries_gapfill": "day-spine window is one-row-per-day by construction",
        "token_budget_allocation": "waterfilling windows run over the |sources|-row aggregate",
        "feature_quantile_normalize": "the exact global rank grid IS the algorithm; Q-grid swap documented",
    },
}

MAX_SHUFFLES = 8

# iterative / multi-pass ops where the shuffle count is the algorithm,
# not drift: value = documented ceiling
SHUFFLE_CEILING: dict[str, int] = {
    "pagerank_transitions": 40,  # fixed power iterations x (join + agg)
    "graph_triangle_count": 16,  # two oriented-edge joins + dedup passes
    "dedup_simhash": 14,  # two block-key candidate passes + verify
    "dedup_connected_components": 64,  # large/small-star rounds to fixpoint
    "dedup_minhash_lsh": 14,  # band join + candidate dedup + 2 verifies
    "graph_label_propagation": 24,  # minhash edge base + 3 vote rounds
    "dq_constraint_audit": 12,  # five independent checks, 1-row exchanges
    "source_similarity_matrix": 10,  # distinct + by-shingle + pair grid + totals
    "pipeline_corpus_curation": 12,  # 4 composed stages, one plan
    "graph_bfs_distance": 16,  # fixed frontier rounds x (join + distinct + anti)
    "link_prediction_adamic_adar": 10,  # reverse cap + candidate join + 2 anti + score + top-k over the checkpointed capped adjacency
    "graph_clustering_coefficient": 16,  # degree-orientation joins + two oriented triangle legs + corner-credit rollup (each post-checkpoint, linear)
    "kmeans_balanced_assign_r2": 14,  # 2 enforcement rounds: 3 per-centroid windows + K-row load agg + overflow joins + 3-way union; every shuffle keyed on vec_id/cent_id, linear
    "ann_recall_eval": 10,  # brute-force truth leg + LSH serving leg + per-query overlap join; the r12 _vecs spread adds its (at-scale no-op) repartition to both legs
    "mmr_diversified_topk": 9,  # candidate shortlist + K greedy selection windows over it; +1 from the r12 _vecs spread repartition
}


def lint(name: str, plan: str) -> list[str]:
    finds: list[str] = []
    if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan):
        if name not in ALLOW["nested_loop"]:
            finds.append("nested_loop/cartesian join")
    # actual Python EXECUTION nodes only — applySchemaToPythonRDD is just
    # createDataFrame over a tiny literal dim (bands/centroids/blocklists)
    if re.search(
        r"BatchEvalPython|ArrowEvalPython|MapInPandas|PythonMapInArrow"
        r"|FlatMapGroupsInPandas|PythonUDTF|MapInArrow",
        plan,
    ):
        if name not in ALLOW["python"]:
            finds.append("Python in plan")
    # global sorts that aren't the heap top-k. TakeOrderedAndProject has
    # no child Sort node (it replaces sort+limit wholesale), so its
    # presence never excuses a SEPARATE full global Sort elsewhere in the
    # plan — each Sort node's OWN detail block decides (global=true is the
    # 2nd Argument), never a plan-wide bypass.
    if name not in ALLOW["global_sort"]:
        for m in re.finditer(
            r"^\(\d+\) Sort\b.*?^Arguments: \[[^\n]*\], (\w+), \d+",
            plan,
            re.M | re.S,
        ):
            if m.group(1) == "true":
                finds.append("global sort (no heap)")
                break
    n_sh = len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))
    cap = SHUFFLE_CEILING.get(name, MAX_SHUFFLES)
    if n_sh > cap:
        finds.append(f"{n_sh} shuffles (> {cap})")
    return finds


def main() -> int:
    registry.load_all()
    names = sys.argv[1:] or list(registry.QUERIES)
    spark = get_spark(app_name="planlint", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name in names:
        if name.startswith("stream_") or name.endswith("_window"):
            continue  # streaming plans resolve only at runtime
        try:
            df = registry.QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            finds = lint(name, buf.getvalue())
        except Exception as e:  # noqa: BLE001
            finds = [f"EXPLAIN FAILED: {type(e).__name__}: {e}"]
        if finds:
            bad += 1
            print(f"{name:45s} {'; '.join(finds)}", flush=True)
    print(f"\n{bad} flagged / {len(names)} linted")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
