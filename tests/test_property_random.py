"""Randomized property tests: run hundreds of adversarial cases through
ONE Spark job each and compare against a driver-side reference
implementation. Catches semantics bugs the fixed fixtures can't reach —
timestamp ties across stages, stage events before the funnel entry,
chunk-boundary off-by-ones at exact stride multiples.

Complements the DuckDB oracles (cross-engine agreement on ONE dataset)
with per-case agreement against an independent reference on many."""

from __future__ import annotations

import hashlib
import os
import random
import tempfile

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators.behavioral import stage_times
from dig_aggregator_core_spark.operators.curation import _CHUNK_S, _CHUNK_W
from dig_aggregator_core_spark.registry import QUERIES

STAGES = ("view", "click", "purchase")


def _funnel_ref(seq: list[tuple[int, str]]) -> tuple:
    t1 = t2 = t3 = None
    for us, et in sorted(seq):
        if t1 is None and et == "view":
            t1 = us
        elif t2 is None and et == "click" and t1 is not None and us > t1:
            t2 = us
        elif t3 is None and et == "purchase" and t2 is not None and us > t2:
            t3 = us
    return (t1, t2, t3)


def test_funnel_fold_matches_reference_on_random_histories(spark):
    rng = random.Random(11)
    rows, expect = [], {}
    for uid in range(300):
        n = rng.randrange(0, 12)
        # tiny timestamp domain (0..5) forces heavy ties, including
        # same-microsecond view+click+purchase collisions
        seq = [
            (rng.randrange(0, 6), rng.choice(STAGES)) for _ in range(n)
        ]
        # targeted edges: purchase-before-view, all-one-stage, tie-only
        if uid % 7 == 0:
            seq = [(2, "purchase"), (3, "click"), (4, "view")] + seq
        if uid % 11 == 0:
            seq = [(1, "view"), (1, "click"), (1, "purchase")]
        expect[uid] = _funnel_ref(seq)
        rows += [(uid, us, et) for us, et in seq]
        if not seq:
            expect.pop(uid)  # empty history: user absent from the output
    ev = spark.createDataFrame(
        rows, "user_id bigint, us bigint, event_type string"
    )
    got = {
        r.user_id: (r.st.t1, r.st.t2, r.st.t3)
        for r in stage_times(ev).collect()
    }
    assert got == expect


def test_chunking_covers_and_reconstructs_random_texts(spark):
    rng = random.Random(13)
    texts = {}
    for i in range(200):
        # lengths hammer the boundaries: 0/1, window, window±1, exact
        # stride multiples, and a long tail
        n = rng.choice(
            [0, 1, _CHUNK_S, _CHUNK_W - 1, _CHUNK_W, _CHUNK_W + 1]
            + [_CHUNK_W + k * _CHUNK_S for k in (1, 2, 3)]
            + [_CHUNK_W + k * _CHUNK_S + d for k in (1, 2) for d in (-1, 1)]
            + [rng.randrange(0, 1200)]
        )
        texts[i] = "".join(rng.choice("abcdef ") for _ in range(n))
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_scratch", "chunk_property"
    )
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    rows = QUERIES["doc_chunk_overlap"](spark, out).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for i, t in texts.items():
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        # contiguous indices from 0, count per the ceil formula
        want_n = 1 + max(0, (max(len(t) - _CHUNK_W, 0) + _CHUNK_S - 1) // _CHUNK_S)
        assert [c.chunk_idx for c in chunks] == list(range(want_n))
        for c in chunks:
            s = t[c.chunk_idx * _CHUNK_S : c.chunk_idx * _CHUNK_S + _CHUNK_W]
            assert c.chunk_len == len(s)
            assert c.chunk_md5 == hashlib.md5(s.encode()).hexdigest()
        # full coverage: chunks tile the text (window > stride)
        covered = max(
            (c.chunk_idx * _CHUNK_S + c.chunk_len for c in chunks), default=0
        )
        assert covered == len(t)
