"""ANN index deletion lifecycle (r12): tombstone delete + targeted
compaction over the bucket-partitioned incremental index.

Contracts pinned here:
  * delete is O(delete-batch): ONLY the tombstone sidecar changes —
    no committed bucket file is rewritten;
  * compaction touches ONLY dirty buckets: survivors rewrite through
    dynamic partition overwrite, clean buckets keep their exact bytes,
    fully-emptied buckets' partition directories disappear;
  * tombstones for compacted buckets are dropped, under-threshold
    residue stays;
  * serving is identical before and after compaction (the registered
    queries share one oracle for exactly this reason).
"""
from __future__ import annotations

import os

import pyspark.sql.functions as F

from dig_aggregator_core_spark.operators.similarity import (
    _DELETED_FILTER,
    _INC_COMMIT_FILTER,
    _build_committed_index,
    _vecs,
    ann_index_append,
    ann_index_compact,
    ann_index_compact_query,
    ann_index_delete,
    ann_index_delete_query,
)


def _file_map(root: str) -> dict:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def _mk_index(spark, sf_dir, out: str) -> None:
    _build_committed_index(spark, sf_dir, out)
    ann_index_append(
        spark, out,
        _vecs(spark, sf_dir).filter(~F.expr(_INC_COMMIT_FILTER)),
    )


def test_delete_touches_only_the_tombstone_sidecar(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    _mk_index(spark, sf_dir, idx)
    data = os.path.join(idx, "index.parquet")
    before = _file_map(data)
    panel = _vecs(spark, sf_dir).filter(F.expr(_DELETED_FILTER))
    ann_index_delete(spark, idx, panel)
    assert _file_map(data) == before, "delete must not rewrite the index"
    tombs = spark.read.parquet(os.path.join(idx, "tombstones.parquet"))
    got = {r["vec_id"] for r in tombs.collect()}
    expect = {r["vec_id"] for r in panel.select("vec_id").collect()}
    assert got == expect
    # every tombstone names its bucket (what makes compaction pruned)
    assert tombs.filter(~F.col("pbucket").startswith("b")).count() == 0


def test_compact_rewrites_only_dirty_buckets(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    _mk_index(spark, sf_dir, idx)
    data = os.path.join(idx, "index.parquet")
    panel = _vecs(spark, sf_dir).filter(F.expr(_DELETED_FILTER))
    ann_index_delete(spark, idx, panel)
    tombs = spark.read.parquet(os.path.join(idx, "tombstones.parquet"))
    dirty = {r["pbucket"] for r in tombs.select("pbucket").distinct().collect()}
    all_rows_before = {
        (r["vec_id"], r["pbucket"])
        for r in spark.read.parquet(data).select("vec_id", "pbucket").collect()
    }
    before = _file_map(data)
    # share 0 -> every dirty bucket compacts
    ann_index_compact(spark, idx, min_share=0.0)
    after = _file_map(data)
    # clean buckets: exact bytes kept
    for p, sig in before.items():
        bucket = [seg for seg in p.split(os.sep) if seg.startswith("pbucket=")]
        if bucket and bucket[0][len("pbucket="):] not in dirty:
            assert after.get(p) == sig, f"clean bucket file rewritten: {p}"
    # deleted rows physically gone, survivors all kept
    deleted = {r["vec_id"] for r in panel.select("vec_id").collect()}
    remaining = {
        (r["vec_id"], r["pbucket"])
        for r in spark.read.parquet(data).select("vec_id", "pbucket").collect()
    }
    assert remaining == {
        (v, b) for (v, b) in all_rows_before if v not in deleted
    }
    # all tombstones consumed at share 0
    assert spark.read.parquet(
        os.path.join(idx, "tombstones.parquet")
    ).count() == 0


def test_partial_compaction_keeps_residual_tombstones(
    spark, sf_dir, tmp_path
):
    idx = str(tmp_path / "idx")
    _mk_index(spark, sf_dir, idx)
    data = os.path.join(idx, "index.parquet")
    rows = spark.read.parquet(data).select("vec_id", "pbucket").collect()
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r["pbucket"], []).append(r["vec_id"])
    # wipe one whole bucket (share 1.0 -> compacts, dir disappears) and
    # one row of a bucket with >= 4 rows (share < 0.5 -> residue stays)
    wipe = min(b for b in by_bucket)
    nick = min(b for b, ids in by_bucket.items() if b != wipe and len(ids) >= 4)
    del_ids = set(by_bucket[wipe]) | {min(by_bucket[nick])}
    panel = _vecs(spark, sf_dir).filter(
        F.col("vec_id").isin([int(i) for i in del_ids])
    )
    ann_index_delete(spark, idx, panel)
    ann_index_compact(spark, idx, min_share=0.5)
    assert not os.path.exists(
        os.path.join(data, f"pbucket={wipe}")
    ), "fully-emptied bucket directory must be removed"
    residue = spark.read.parquet(os.path.join(idx, "tombstones.parquet"))
    got = {(r["vec_id"], r["pbucket"]) for r in residue.collect()}
    assert got == {(min(by_bucket[nick]), nick)}
    # the nicked bucket was NOT rewritten — its deleted row is still
    # physically there (tombstone-filtered at serve time)
    assert spark.read.parquet(data).filter(
        F.col("vec_id") == min(by_bucket[nick])
    ).count() == 1


def test_registered_queries_serve_identically(spark, sf_dir):
    a = sorted(map(tuple, ann_index_delete_query(spark, sf_dir).collect()))
    b = sorted(map(tuple, ann_index_compact_query(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0
    # compaction already ran on the shared scratch — the delete query
    # must serve the same rows on the compacted state too
    c = sorted(map(tuple, ann_index_delete_query(spark, sf_dir).collect()))
    assert c == a
