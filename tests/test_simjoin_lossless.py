"""Adversarial check that prefix filtering in simjoin_prefix_jaccard is
LOSSLESS: on a corpus engineered to break lossy blocking — exact
duplicates, tail mutations straddling the threshold, a stop-shingle
planted in EVERY document, and sub-shingle-length docs — the operator's
pair set and Jaccard values must equal a driver-side brute force over all
pairs. The benign fixture can't catch a prefix one-off (|s| - ceil(t|s|)
instead of +1) or a df-ordering regression; this corpus can, because many
pairs sit exactly AT the 0.5 threshold where a too-short prefix first
drops candidates."""

from __future__ import annotations

import os
import random
import tempfile
from itertools import combinations

from dig_aggregator_core_spark.operators.dedup import _SJ_T
from dig_aggregator_core_spark.registry import QUERIES

VOCAB = [f"w{i}" for i in range(30)]
STOP = "the of and to a"  # planted in every doc: a df = n_docs shingle


def _docs() -> list[tuple[int, str]]:
    rng = random.Random(7)
    docs: list[tuple[int, str]] = []
    for i in range(20):
        toks = [rng.choice(VOCAB) for _ in range(40)]
        mid = rng.randrange(5, 30)
        toks[mid : mid + 5] = STOP.split()
        docs.append((i, " ".join(toks)))
    # exact duplicate (jac = 1.0) and a prefix-straddling tail mutation
    docs.append((100, docs[0][1]))
    base = docs[1][1].split()
    # keep 30/40 tokens: jaccard lands just above 0.5, right where a
    # one-short prefix would first lose the candidate
    mut = base[:30] + [rng.choice(VOCAB) for _ in range(10)]
    docs.append((101, " ".join(mut)))
    # sub-shingle-length docs: the whole-text shingle path
    docs.append((102, "w1 w2"))
    docs.append((103, "w1 w2"))
    docs.append((104, "w1"))
    return docs


def _shingles(text: str) -> frozenset[str]:
    toks = text.split(" ")
    n = max(len(toks) - 4, 1)
    return frozenset(" ".join(toks[i : i + 5]) for i in range(n))


def _brute(docs) -> dict[tuple[int, int], float]:
    out = {}
    sets = {i: _shingles(t) for i, t in docs}
    for (a, sa), (b, sb) in combinations(sets.items(), 2):
        j = len(sa & sb) / len(sa | sb)
        if j >= _SJ_T:
            out[(min(a, b), max(a, b))] = round(j, 6)
    return out


def test_prefix_filter_is_lossless(spark):
    docs = _docs()
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_scratch", "simjoin_adversarial"
    )
    spark.createDataFrame(
        [(i, t, "en", "srcX", len(t)) for i, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    got = {
        (r.doc_a, r.doc_b): r.jac
        for r in QUERIES["simjoin_prefix_jaccard"](spark, out).collect()
    }
    want = _brute(docs)
    assert want, "adversarial corpus must contain qualifying pairs"
    assert (100 in {a for a, _ in want} or 100 in {b for _, b in want})
    assert got.keys() == want.keys()
    for k, j in want.items():
        assert abs(got[k] - j) < 1e-9, (k, got[k], j)
