"""The WordPiece L-bounded map-probe fold (production-vocab form) must be
EXTENSIONALLY EQUAL to the literal-vocab-scan fold — same greedy
longest-match, same position rules, same whole-word [UNK] voiding — on
real corpus words and on adversarial synthetic ones. The probe form is
what the registered query ships (VERDICT r7 task 5); the literal form is
the executable spec it is checked against."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dig_aggregator_core_spark.operators import training
from dig_aggregator_core_spark.tables import load


def _encode(spark, words: list[str], probe: bool) -> list[str]:
    df = spark.createDataFrame([(w,) for w in words], "w string")
    expr = training._wp_fold("spark", probe=probe)
    return [r["e"] for r in df.select(F.expr(expr).alias("e")).collect()]


# words engineered at the seams: single pieces, multi-piece chains,
# longest-vs-shorter overlap ('tab' vs 't'+'##a'+'##b', 'val' vs 'v'...),
# the absent '##w' (whole-word [UNK] on 'row'/'window'), absent letters
# ('z' initial exists? 'z' not in _WP_LETTERS -> [UNK]), and empty-ish
_SEAM_WORDS = [
    "a", "th", "tab", "table", "tablet", "thin", "than", "banana",
    "value", "values", "queue", "quiver", "scale", "schema",
    "row", "slow", "window", "wow", "w",
    "zebra", "quartz", "x", "jojoba", "hahaha",
    "tabtab", "valval", "thth", "intable", "erle",
]


def test_probe_equals_literal_on_seam_words(spark):
    lit = _encode(spark, _SEAM_WORDS, probe=False)
    prb = _encode(spark, _SEAM_WORDS, probe=True)
    assert prb == lit, [
        (w, a, b) for w, a, b in zip(_SEAM_WORDS, lit, prb) if a != b
    ]


def test_probe_equals_literal_on_corpus(spark, sf_dir):
    """Every distinct word of the fixture corpus encodes identically."""
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter("w <> ''")
        .distinct()
    )
    lit = training._wp_fold("spark", probe=False)
    prb = training._wp_fold("spark", probe=True)
    n_diff = (
        words.select(
            "w", F.expr(lit).alias("el"), F.expr(prb).alias("ep")
        )
        .filter("el <> ep")
        .count()
    )
    assert n_diff == 0


def test_probe_equals_literal_property(spark):
    """Hypothesis-style sweep without a running-session fixture conflict:
    deterministic pseudo-random words over the corpus alphabet plus '#'
    and rare letters, lengths 0-14 — the fold state machine's full input
    space (the '#' char can never match: vocab surface forms are probed
    with the '##' prefix added by position, so a literal '#' in a word
    voids it in BOTH forms)."""
    import random

    rng = random.Random(0x5EAD)
    alphabet = training._WP_LETTERS + "zx#"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        for _ in range(400)
    ]
    lit = _encode(spark, words, probe=False)
    prb = _encode(spark, words, probe=True)
    assert prb == lit, [
        (w, a, b) for w, a, b in zip(words, lit, prb) if a != b
    ]


def test_registered_query_uses_probe_form(spark, sf_dir):
    """The fixture vocab (54 pieces) is over _WP_PROBE_MIN_VOCAB, so the
    shipping plan must carry the map probe (map_contains_key), not the
    O(|vocab|) literal array scan."""
    assert len(training._WP_VOCAB) > training._WP_PROBE_MIN_VOCAB
    df = training.tokenizer_wordpiece_apply(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "map_contains_key" in analyzed
