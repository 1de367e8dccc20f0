"""Reference-replay test for dedup_span_removal: rebuild an adversarial
corpus (shared boilerplate at head/middle/tail, overlapping repeats,
short docs below the window, a doc that is ENTIRELY boilerplate) and
check the operator's cleaned text against a brute-force Python replay of
the spec: strided w=64/s=32 windows, spans seen in 2+ docs removed from
every doc but the min-doc_id carrier, overlaps merged.
"""

from __future__ import annotations

import hashlib

from dig_aggregator_core_spark.operators.dedup import (
    _SUBSTR_S,
    _SUBSTR_W,
    dedup_span_removal,
)


def _reference(docs: dict[int, str]) -> dict[int, str]:
    spans: dict[str, list[tuple[int, int]]] = {}
    for did, text in docs.items():
        if len(text) < _SUBSTR_W:
            continue
        for pos in range(0, len(text) - _SUBSTR_W + 1, _SUBSTR_S):
            d = hashlib.md5(
                text[pos : pos + _SUBSTR_W].encode()
            ).hexdigest()
            spans.setdefault(d, []).append((did, pos))
    rep_first = {
        d: min(p[0] for p in occ)
        for d, occ in spans.items()
        if len({p[0] for p in occ}) > 1
    }
    out = {}
    for did, text in docs.items():
        marked = sorted(
            {
                pos
                for d, occ in spans.items()
                if d in rep_first and rep_first[d] < did
                for (odid, pos) in occ
                if odid == did
            }
        )
        acc, cur = [], 0
        for s in marked:
            if s > cur:
                acc.append(text[cur:s])
            cur = max(cur, s + _SUBSTR_W)
        acc.append(text[cur:])
        out[did] = "".join(acc)
    return out


def test_span_removal_matches_reference(spark, tmp_path):
    boiler = "LICENSE HEADER " * 8  # 120 chars of shared boilerplate
    # repeats are placed at offsets = 0 mod stride: strided windows only
    # detect cross-doc runs whose offsets agree mod s (the documented
    # approximation vs a true suffix array), so the "must remove" claims
    # below need aligned placements; ref-replay covers the unaligned
    # behavior either way
    docs = {
        0: boiler + "a" * 150,            # first carrier: kept
        1: boiler + "b" * 150,            # head repeat: removed
        2: "c" * 128 + boiler + "d" * 64,  # middle repeat, offset 128
        3: "e" * 160 + boiler,            # tail repeat, offset 160
        4: boiler + boiler,               # doc of pure boilerplate
        5: "short doc under the window",  # below w: untouched
        6: "f" * 200,                     # no cross-doc repeats: untouched
    }
    df = spark.createDataFrame(
        [(k, v, "en", "s0", len(v)) for k, v in docs.items()],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    path = str(tmp_path / "corpus")
    df.write.parquet(path + "/documents.parquet")
    got = {
        r["doc_id"]: r["cleaned"]
        for r in dedup_span_removal(spark, path).collect()
    }
    ref = _reference(docs)
    assert got == ref
    # semantic guarantees worth asserting explicitly
    assert got[0] == docs[0]          # first carrier untouched
    assert got[5] == docs[5]          # sub-window doc untouched
    assert got[6] == docs[6]          # unique doc untouched
    assert len(got[1]) < len(docs[1])  # repeats actually removed
    assert boiler not in got[3]
