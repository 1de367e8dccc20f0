"""Adversarial recall check for the blocked n-gram Jaccard dedup.

The fixture oracle (unblocked quadratic reference) already proves zero
loss ON THE FIXTURE; this test rebuilds the corpus adversarially so that
near-dup pairs straddle every length-band boundary the blocking uses
(|shingles| crossing powers of two), plus sub-3-token docs (singleton
shingle path) and cross-language decoys — and compares the operator's
full output against a brute-force Python reference. Any future change to
the banding/probing that loses a qualifying pair fails here even though
the sf fixtures would never notice.
"""

from __future__ import annotations

import itertools
import random

import pandas as pd
import pytest

from dig_aggregator_core_spark.operators.dedup import (
    MUT_OFFSET,
    dedup_ngram_jaccard,
)


def _shingles(toks: list[str]) -> frozenset[str]:
    if len(toks) >= 3:
        return frozenset(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    return frozenset({" ".join(toks)})


def test_ngram_jaccard_blocking_loses_no_pair(spark, tmp_path):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs: list[tuple[int, str, str]] = []
    did = 0
    # sizes placed ON and AROUND the power-of-two shingle-count boundaries
    # the length-band blocking keys on
    for lang in ("en", "de"):
        for size in (2, 3, 4, 5, 7, 8, 9, 10, 15, 16, 17, 18, 31, 32, 33):
            base = [rng.choice(vocab) for _ in range(size)]
            docs.append((did, " ".join(base), lang))
            did += 1
            if size > 3:  # near-dup one token shorter: crosses the band
                docs.append((did, " ".join(base[:-1]), lang))
                did += 1
            docs.append((did, " ".join(base), lang))  # exact dup
            did += 1
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang"])
    pdf["source"] = "synthetic"
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    # brute-force reference replaying the operator's corpus construction
    # (original + 80%-truncated mutation of every doc)
    corpus: list[tuple[int, frozenset[str], str]] = []
    for d, text, lang in docs:
        toks = text.split(" ")
        corpus.append((d, _shingles(toks), lang))
        cut = max(3, len(toks) * 4 // 5)
        corpus.append((d + MUT_OFFSET, _shingles(toks[:cut]), lang))
    expected: dict[tuple[int, int], float] = {}
    for (da, sa, la), (db, sb, lb) in itertools.combinations(corpus, 2):
        if la != lb:
            continue
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= 0.5:
            lo, hi = min(da, db), max(da, db)
            expected[(lo, hi)] = jac

    rows = dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert set(got) == set(expected), (
        f"missed: {sorted(set(expected) - set(got))[:5]} "
        f"spurious: {sorted(set(got) - set(expected))[:5]}"
    )
    for pair, jac in expected.items():
        assert got[pair] == pytest.approx(jac, abs=1e-6)
