"""Invariant tests for the round-5 packing/chunking operators.

- pack_bins_ffd: the assignment must BE first-fit-decreasing — equal to a
  Python reference replaying the algorithm — and no bin may exceed
  capacity (the property the packer exists to guarantee).
- chunk_cdc_rolling: chunks must reconstruct the document exactly, and —
  the content-defined claim itself — prepending text to a document must
  leave the digests of all chunks after the first post-edit boundary
  intact, where a fixed-stride chunker would shift every window.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators.dedup import _CDC_W, chunk_cdc_rolling
from dig_aggregator_core_spark.operators.training import _FFD_CAP, pack_bins_ffd
from dig_aggregator_core_spark.tables import load


def _ffd_reference(lens_sorted: list[tuple[int, int]]) -> dict[int, int]:
    """(doc_id, len) in FFD order -> doc_id -> 1-based bin index."""
    bins: list[int] = []
    out: dict[int, int] = {}
    for doc_id, ln in lens_sorted:
        for i, rem in enumerate(bins):
            if rem >= ln:
                bins[i] = rem - ln
                out[doc_id] = i + 1
                break
        else:
            bins.append(_FFD_CAP - ln)
            out[doc_id] = len(bins)
    return out


def test_ffd_matches_python_reference_and_respects_capacity(spark, sf_dir):
    rows = pack_bins_ffd(spark, sf_dir).collect()
    docs = {
        (r["source"], r["shard"], r["doc_id"]): (r["n_toks"], r["bin_idx"])
        for r in rows
    }
    by_group: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for (src, shard, doc_id), (n_toks, _b) in docs.items():
        by_group.setdefault((src, shard), []).append((doc_id, n_toks))
    for grp, pairs in by_group.items():
        ordered = sorted(pairs, key=lambda p: (-p[1], p[0]))
        expected = _ffd_reference(ordered)
        got = {d: docs[(*grp, d)][1] for d, _l in pairs}
        assert got == expected, grp
    # capacity invariant per (source, shard, bin)
    fill: dict[tuple[str, int, int], int] = {}
    for (src, shard, _d), (n_toks, b) in docs.items():
        fill[(src, shard, b)] = fill.get((src, shard, b), 0) + n_toks
    over = {k: v for k, v in fill.items() if v > _FFD_CAP}
    assert not over, over


def test_cdc_chunks_reconstruct_documents(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents")
        .filter(F.length("text") >= _CDC_W)
        .collect()
    }
    chunks = chunk_cdc_rolling(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        text = docs[doc_id]
        # lengths partition the text; digests match the slices
        assert sum(r["chunk_len"] for r in rs) == len(text)
        pos = 0
        for r in rs:
            seg = text[pos : pos + r["chunk_len"]]
            assert hashlib.md5(seg.encode()).hexdigest() == r["chunk_md5"]
            pos += r["chunk_len"]


def test_cdc_boundaries_survive_a_prefix_edit(spark, tmp_path):
    """THE content-defined property: prepend 3 chars to a doc; all chunk
    digests after the first boundary following the edit must be identical
    to the original's tail digests. A fixed-stride chunker (compare
    dedup_exact_substring) shifts every window and shares nothing."""
    base = (
        "the quick brown fox jumps over the lazy dog while carrying "
        "a heavy basket of fresh garden vegetables to the market near "
        "the old stone bridge just before sunrise on a cold autumn day"
    ) * 3
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [base, "XY " + base],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [len(base), len(base) + 3],
        }
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    rows = chunk_cdc_rolling(spark, str(tmp_path)).collect()
    d1 = sorted(
        (r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_idx"]
    )
    d2 = sorted(
        (r for r in rows if r["doc_id"] == 2), key=lambda r: r["chunk_idx"]
    )
    h1 = [r["chunk_md5"] for r in d1]
    h2 = [r["chunk_md5"] for r in d2]
    # once past the edit's absorbing chunk the boundary streams must
    # re-align exactly: the digest lists share a long common SUFFIX
    # (set-intersection would undercount on this deliberately repetitive
    # text, where identical chunks recur)
    suffix = 0
    while (
        suffix < min(len(h1), len(h2))
        and h1[-1 - suffix] == h2[-1 - suffix]
    ):
        suffix += 1
    assert suffix >= min(len(h1), len(h2)) - 2, (suffix, h1, h2)
