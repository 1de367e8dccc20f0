"""tables.maybe_spread: the under-partitioned-scan guard must spread a
small local scan, keep a wide layout untouched, and treat unknown
(non-local) paths as already-parallel — the behavior five CPU-heavy
operators now depend on instead of a plan-forcing df.rdd probe."""

from __future__ import annotations

import os

from dig_aggregator_core_spark.tables import (
    _scan_width,
    load,
    maybe_spread,
)


def test_small_local_scan_spreads(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = maybe_spread(docs, sf_dir, "documents", "doc_id")
    par = spark.sparkContext.defaultParallelism
    assert _scan_width(sf_dir, "documents") < par
    # the guard must produce a repartition node (deterministic hash on
    # doc_id), visible in the plan, not silently no-op
    assert "RepartitionByExpression" in out._jdf.queryExecution().logical().toString()


def test_unknown_path_is_left_alone(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # an s3://-style path can't be probed locally: width is None and the
    # scan keeps its own partitioning (at real scale the input splits
    # already parallelize; a blind repartition would be a full shuffle)
    assert _scan_width("s3://bucket/prefix", "documents") is None
    out = maybe_spread(docs, "s3://bucket/prefix", "documents", "doc_id")
    assert out is docs


def test_width_counts_files_and_splits(tmp_path, spark, sf_dir):
    # a directory of part files counts each file (plus 128 MiB splits)
    d = os.path.join(str(tmp_path), "t.parquet")
    load(spark, sf_dir, "region").repartition(3).write.parquet(d)
    w = _scan_width(str(tmp_path), "t")
    n_parts = len(
        [f for f in os.listdir(d) if f.endswith(".parquet")]
    )
    assert w >= n_parts >= 1
