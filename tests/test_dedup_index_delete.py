"""Band-index deletion twin (r12): a takedown panel recorded as a
tombstone sidecar must remove exactly its pairs from the incremental
near-dup probe, without rewriting any band partition."""
from __future__ import annotations

import os

import pyspark.sql.functions as F

from dig_aggregator_core_spark.operators.dedup import (
    _DEDUP_DELETED_FILTER,
    _band_index_path,
    _shingled,
    dedup_incremental_minhash,
    dedup_index_delete,
)


def _file_map(root: str) -> dict:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_delete_removes_exactly_the_panels_pairs(spark, sf_dir):
    full = {
        (r["doc_new"], r["doc_seen"], r["jaccard"])
        for r in dedup_incremental_minhash(spark, sf_dir).collect()
    }
    index_path = _band_index_path(spark, sf_dir)
    before = _file_map(index_path)
    got = {
        (r["doc_new"], r["doc_seen"], r["jaccard"])
        for r in dedup_index_delete(spark, sf_dir).collect()
    }
    # tombstoning never rewrites a band partition
    assert _file_map(index_path) == before
    panel = {
        r["doc_id"]
        for r in _shingled(spark, sf_dir)
        .filter(F.expr(_DEDUP_DELETED_FILTER))
        .select("doc_id")
        .collect()
    }
    assert panel, "fixture panel must be non-empty"
    expect = {t for t in full if t[1] not in panel}
    assert got == expect
    # the deletion is visible: at least one pair actually disappeared
    assert len(got) < len(full)
