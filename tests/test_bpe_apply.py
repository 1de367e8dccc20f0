"""Invariants of the BPE apply encoder (tokenizer_bpe_apply):

1. LOSSLESS — concatenating a word's tokens reconstructs the word.
2. FIXPOINT — after the full pass no adjacent token pair matches any
   merge rule (guaranteed by well-formedness: a rule's merges only
   create pairs for later rules; a violation means the encoder
   under-applied its table).
3. ENGINE = REFERENCE — the Spark fold equals a plain-Python greedy
   left-to-right replay of the same ordered rules, word for word.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_aggregator_core_spark import registry
from dig_aggregator_core_spark.operators.training import _BPE_MERGES
from dig_aggregator_core_spark.tables import load

registry.load_all()

RULES = [tuple(m.split()) for m in _BPE_MERGES]


def _encode(word: str) -> list[str]:
    toks = list(word)
    for left, right in RULES:
        out: list[str] = []
        for t in toks:
            if out and out[-1] == left and t == right:
                out[-1] = left + right
            else:
                out.append(t)
        toks = out
    return toks


def test_bpe_rules_are_well_formed():
    """Every composite side must be produced by an EARLIER rule —
    the property that makes rule-by-rule exhaustive application equal
    true priority-order BPE."""
    known = {chr(c) for c in range(ord("a"), ord("z") + 1)}
    for left, right in RULES:
        assert left in known and right in known, (left, right)
        known.add(left + right)


def test_bpe_apply_matches_reference_replay(spark, sf_dir):
    out = registry.QUERIES["tokenizer_bpe_apply"](spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["n_tokens"], r["first_word_tokens"])
        for r in out.collect()
    }
    for r in docs.collect():
        words = [w for w in r["text"].split(" ") if w]
        encs = [_encode(w) for w in words]
        # losslessness + fixpoint of the reference replay itself
        for w, toks in zip(words, encs):
            assert "".join(toks) == w
            for a, b in zip(toks, toks[1:]):
                assert (a, b) not in RULES, (w, toks)
        n_tokens = sum(len(t) for t in encs)
        assert got[r["doc_id"]] == (n_tokens, "~".join(encs[0]))
