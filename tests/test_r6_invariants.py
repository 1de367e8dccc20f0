"""Algorithmic invariants of the round-6 operators — properties the
oracle hash can't express (it pins equality, not meaning): probability
mass bounds for the KN model, BFS distance laws, F1 bounds, RAKE score
positivity, DPO ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_aggregator_core_spark import registry

registry.load_all()


def test_kn_bigram_mass_bounded(spark, sf_dir):
    # sum over reported w2 of P(w2|w1) must stay <= 1 (truncating DIV
    # only loses mass; the report is a subset of the full conditional)
    df = registry.QUERIES["lm_kneser_ney_bigram"](spark, sf_dir)
    mass = df.groupBy("w1").agg(F.sum("p_kn_micro").alias("m"))
    assert mass.filter(F.col("m") > 1_000_000).count() == 0
    assert df.filter(F.col("p_kn_micro") <= 0).count() == 0


def test_bfs_distance_laws(spark, sf_dir):
    from dig_aggregator_core_spark.operators.graph import (
        _BFS_ROUNDS,
        _BFS_SEED_MOD,
    )

    df = registry.QUERIES["graph_bfs_distance"](spark, sf_dir)
    rows = {r.user_id: r.dist for r in df.collect()}
    assert rows, "no reachable nodes"
    for uid, d in rows.items():
        assert 0 <= d <= _BFS_ROUNDS
        # seeds and only seeds are at distance 0
        assert (d == 0) == (uid % _BFS_SEED_MOD == 0)
    # each node appears exactly once (min-dist semantics)
    assert df.count() == df.select("user_id").distinct().count()


def test_f1_is_harmonic_mean_bounded(spark, sf_dir):
    df = registry.QUERIES["eval_f1_confusion"](spark, sf_dir)
    bad = df.filter(
        (F.col("f1_micro") < 0)
        | (F.col("f1_micro") > 1_000_000)
        | (F.col("f1_micro") > F.greatest("precision_micro", "recall_micro"))
        | (F.col("tp") < 0)
        | (F.col("fp") < 0)
        | (F.col("fn") < 0)
    )
    assert bad.count() == 0
    assert df.count() == 5  # one row per fixture class


def test_rake_scores_positive_and_ranked(spark, sf_dir):
    df = registry.QUERIES["text_keyword_rake"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    scores = [r.score_micro for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # multi-word phrases score at least their best single word — degree
    # >= freq always, so every word score >= 1e6 and a phrase of n words
    # scores >= n * 1e6
    for r in rows:
        assert r.score_micro >= r.n_words * 1_000_000


def test_dpo_margin_nonnegative_and_disjoint(spark, sf_dir):
    df = registry.QUERIES["dpo_pair_assembly"](spark, sf_dir)
    assert df.filter(F.col("margin") < 0).count() == 0
    assert (
        df.filter(F.col("chosen_doc") == F.col("rejected_doc")).count() == 0
    )
    # each document plays at most one role across the whole pair set
    ids = (
        df.select(F.col("prompt_doc").alias("d"))
        .unionByName(df.select(F.col("chosen_doc").alias("d")))
        .unionByName(df.select(F.col("rejected_doc").alias("d")))
    )
    assert ids.count() == ids.distinct().count()


def test_asof_forward_backward_bracket(spark, sf_dir):
    # a click's backward match is at ts <= click and its forward match at
    # ts >= click, so whenever both exist with distinct values the pair
    # brackets the click — checked via the two ops' shared fixture
    b = registry.QUERIES["asof_join"](spark, sf_dir).select(
        "click_id", F.col("last_purchase_value").alias("bv")
    )
    f = registry.QUERIES["asof_join_forward"](spark, sf_dir).select(
        "click_id", F.col("next_purchase_value").alias("fv")
    )
    j = b.join(f, "click_id")
    assert j.count() > 0
    # both columns non-null only when a purchase exists on that side;
    # row counts must agree (same click relation)
    assert b.count() == f.count()
