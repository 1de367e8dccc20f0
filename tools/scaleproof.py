"""Scale proof: measure how the training-data operators scale when the
corpus grows 10x and 100x past the bench fixture (sf0.1 -> ~sf1 -> ~sf10
equivalents for the documents/events/embeddings tables).

The copies are built so the DATA STRUCTURE scales realistically instead
of degenerately:

- documents: every copy's tokens are namespaced with a copy prefix, so
  within-copy near-dup structure is preserved exactly while cross-copy
  Jaccard is 0 — naive duplication would make each text an exact dup of
  its 99 clones and blow the near-dup pair count up quadratically
  (C(100,2) pairs per document), which no real corpus does.
- events: user_id offsets per copy — horizontal user growth, identical
  per-user density (the realistic axis; deeper per-user histories would
  instead stress the per-key-state bound documented on the fold ops).
- embeddings: vec_id offsets + a tiny per-copy component shift (keeps
  bucket occupancy realistic; exact clones would pile into one LSH
  bucket).

Usage: python tools/scaleproof.py [--gen-only] [x10|x100 ...]
Prints one JSON line per scale with warm (min-of-2) per-query seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dig_aggregator_core_spark import registry  # noqa: E402
from dig_aggregator_core_spark.session import get_spark  # noqa: E402
from dig_aggregator_core_spark.tables import load  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join("/tmp", "spark_graft_scale")

OPS = [
    "dedup_exact",
    "simjoin_prefix_jaccard",
    "dedup_minhash_lsh",
    "bm25_topk",
    "bpe_pair_stats",
    "doc_chunk_overlap",
    "text_quality_score",
    "funnel_conversion",
    "cohort_retention",
    "sessionize_events",
    "timeseries_resample_ohlc",
    "profile_drift",
    "ann_lsh_buckets",
    "ann_lsh_adaptive",
    "kmeans_embeddings",
    # r5 additions
    "ann_lsh_multiprobe",
    "ann_hard_negatives",
    "decontam_source_matrix",
    "pack_bins_ffd",
    "chunk_cdc_rolling",
    "simjoin_containment",
    "attribution_last_touch",
    "knn_centroid_label_eval",
    "user_activity_streaks",
    "timeseries_anomaly_rolling",
    "mixture_temperature_reweight",
    "dedup_cluster_representative",
    # r6 additions
    "graph_bfs_distance",
    "text_keyword_rake",
    "lm_kneser_ney_bigram",
    "dpo_pair_assembly",
    "eval_f1_confusion",
    "asof_join_forward",
    # r6 late-session additions
    "feature_hashing_trick",
    "lm_good_turing",
    "text_zipf_fit",
    "text_ngram_novelty",
    "graph_degree_assortativity",
    "feature_rfm_segmentation",
    "eval_kendall_tau_b",
    "survival_kaplan_meier",
]


def generate(spark, k: int, out: str) -> None:
    copies = spark.range(k).select(F.col("id").alias("cp"))

    def _fresh(table: str) -> bool:
        # already materialized (possibly by a prior round) — skip; the
        # derivation is deterministic from BASE so a skip never serves
        # different data
        return not os.path.exists(os.path.join(out, f"{table}.parquet"))

    if _fresh("documents"):
        docs = load(spark, BASE, "documents").crossJoin(copies).select(
            (F.col("doc_id") + F.col("cp") * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(
                        F.lit("c"), F.col("cp").cast("string"), t
                    ),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        docs = docs.withColumn("n_chars", F.length("text").cast("bigint"))
        docs.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
    if _fresh("events"):
        ev = load(spark, BASE, "events").crossJoin(copies).select(
            (F.col("event_id") + F.col("cp") * 1_000_000_000).alias(
                "event_id"
            ),
            "ts",
            (F.col("user_id") + F.col("cp") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        ev.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, "events.parquet")
        )
    if _fresh("embeddings"):
        emb = load(spark, BASE, "embeddings").crossJoin(copies).select(
            (F.col("vec_id") + F.col("cp") * 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (
                    x + F.col("cp").cast("float") * F.lit(0.0001)
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
        emb.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet")
        )
    # orders IS on a scaled axis since r11 (window_ntile_cuts et al.):
    # keys offset per copy, totalprice shifted a cent per copy so the
    # value distribution widens instead of producing exact ties
    orders_dst = os.path.join(out, "orders.parquet")
    if os.path.islink(orders_dst):
        os.unlink(orders_dst)
    if _fresh("orders"):
        od = load(spark, BASE, "orders").crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("cp") * 1_000_000_000).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.col("cp") * 1_000_000).alias(
                "o_custkey"
            ),
            "o_orderstatus",
            (F.col("o_totalprice") + F.col("cp") * 0.01).alias(
                "o_totalprice"
            ),
            "o_orderdate",
            "o_orderpriority",
        )
        od.repartition(32).write.mode("overwrite").parquet(orders_dst)
    # the remaining TPC-H tables aren't on the scaled axes — link them
    # unscaled so ops that join them (e.g. negative_sampling_recsys)
    # still run
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem"):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), dst)


def time_ops(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in OPS:
        fn = registry.QUERIES[name]
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"# {name} FAILED: {type(e).__name__}: {e}", flush=True)
    return times


def main() -> None:
    registry.load_all()
    global OPS
    for a in sys.argv[1:]:
        if a.startswith("--ops="):
            OPS = a[len("--ops="):].split(",")
    spark = get_spark(app_name="scaleproof")
    spark.sparkContext.setLogLevel("ERROR")
    scales = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "x10",
        "x100",
    ]
    base_times = None
    if "--gen-only" not in sys.argv:
        base_times = time_ops(spark, BASE)
        print(
            json.dumps({"scale": "x1", "dir": BASE, "queries": base_times}),
            flush=True,
        )
    for s in scales:
        k = int(s.lstrip("x"))
        out = os.path.join(ROOT, s)
        orders_p = os.path.join(out, "orders.parquet")
        if (
            not os.path.exists(os.path.join(out, "embeddings.parquet"))
            or os.path.islink(orders_p)
            or not os.path.exists(orders_p)
        ):
            generate(spark, k, out)
        if "--gen-only" in sys.argv:
            continue
        times = time_ops(spark, out)
        rec = {"scale": s, "dir": out, "queries": times}
        if base_times:
            rec["ratio"] = {
                n: (
                    round(times[n] / base_times[n], 1)
                    if times[n] > 0 and base_times.get(n, 0) > 0
                    else None
                )
                for n in times
            }
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
