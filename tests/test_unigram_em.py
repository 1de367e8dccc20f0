"""Unigram-LM EM step properties (r9): count consistency with the
Viterbi encoder, score normalization, and the Viterbi-optimality half of
the EM monotonicity argument under the re-estimated parameters."""

import math

import pytest
from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators import training as T


@pytest.fixture(scope="module")
def em_rows(spark, sf_dir):
    return T.tokenizer_unigram_em_step(spark, sf_dir).collect()


def test_counts_match_viterbi_piece_totals(spark, sf_dir, em_rows):
    vit = T.tokenizer_unigram_viterbi(spark, sf_dir)
    n_pieces = vit.agg(F.sum("n_pieces")).first()[0]
    assert sum(r["n"] for r in em_rows) == n_pieces
    # every observed piece is in the current vocab
    assert all(r["piece"] in T._UNI_VOCAB for r in em_rows)


def test_scores_are_normalized_log_probs(em_rows):
    total = sum(r["n"] for r in em_rows)
    for r in em_rows:
        want = round(math.log(r["n"]) * 1e6) - round(math.log(total) * 1e6)
        assert r["new_score_micro_nats"] == want
        assert r["new_score_micro_nats"] <= 0
    # sum of probabilities ~ 1 (integer micro-nat rounding tolerance)
    p = sum(math.exp(r["new_score_micro_nats"] / 1e6) for r in em_rows)
    assert abs(p - 1.0) < 1e-3


def test_reencode_under_new_params_is_viterbi_optimal(
    spark, sf_dir, em_rows, monkeypatch
):
    """Scoring the OLD segmentation under the NEW params is exactly
    sum(n * new_score) — re-running Viterbi under the new params must do
    at least as well (the argmax half of hard-EM monotonicity)."""
    old_seg_ll = sum(r["n"] * r["new_score_micro_nats"] for r in em_rows)
    new_vocab = {
        r["piece"]: int(r["new_score_micro_nats"]) for r in em_rows
    }
    # singles must stay segmentable: every observed corpus char piece is
    # in the EM output by construction (it was observed), but guard the
    # letters anyway so the re-encode never hits the NEG sentinel
    for c in T._UNI_LETTERS:
        new_vocab.setdefault(c, -30_000_000)
    monkeypatch.setattr(T, "_UNI_VOCAB", new_vocab)
    monkeypatch.setattr(
        T, "_UNI_MAXL", max(len(p) for p in new_vocab)
    )
    revit = T.tokenizer_unigram_viterbi(spark, sf_dir)
    new_ll = revit.agg(F.sum("total_score")).first()[0]
    assert new_ll >= old_seg_ll
