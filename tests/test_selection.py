"""Invariant tests for the data-selection family (operators/selection.py).

The oracles already pin exact values on the fixtures; these tests pin the
SEMANTIC guarantees a training pipeline relies on — budget never exceeded,
waterfilling fairness, curriculum order is a permutation, DSIR selects
target-looking documents — including a waterfilling case with skewed
sources that the uniform fixture can't exercise.
"""

from __future__ import annotations

import pytest

from dig_aggregator_core_spark.operators.selection import (
    BUDGET_DEN,
    BUDGET_NUM,
    CURRICULUM_SHARDS,
    curriculum_order,
    dsir_importance_select,
    token_budget_allocation,
)


def _waterfill_reference(totals: dict[str, int], budget: int) -> dict[str, int]:
    """Brute-force waterfilling: find the integer level by scanning."""
    if sum(totals.values()) <= budget:
        return dict(totals)
    # binary search the cap level L: sum(min(t, L)) <= budget, maximal
    lo, hi = 0, max(totals.values())
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if sum(min(t, mid) for t in totals.values()) <= budget:
            lo = mid
        else:
            hi = mid - 1
    return {s: min(t, lo) for s, t in totals.items()}


def test_token_budget_invariants(spark, sf_dir):
    rows = token_budget_allocation(spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = (total * BUDGET_NUM) // BUDGET_DEN
    picked = sum(r["n_tokens"] for r in rows if r["selected"])
    assert picked <= budget
    # per-source: selected tokens fit the allocation; alloc <= source total
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    alloc_sum = 0
    for src, rs in by_src.items():
        alloc = rs[0]["alloc"]
        assert all(r["alloc"] == alloc for r in rs)
        src_total = sum(r["n_tokens"] for r in rs)
        assert alloc <= src_total
        assert sum(r["n_tokens"] for r in rs if r["selected"]) <= alloc
        alloc_sum += alloc
    assert alloc_sum <= budget


def test_waterfilling_matches_reference_on_skewed_sources(spark, tmp_path):
    """The closed-form windowed waterfilling equals brute-force search on
    a skewed corpus (one giant source, several tiny ones) — the shape the
    uniform fixture never produces."""
    words = {
        "giant": 400,
        "big": 120,
        "mid": 60,
        "tiny1": 10,
        "tiny2": 10,
    }
    recs = []
    did = 0
    for src, n_words in words.items():
        # 10 docs per source, n_words/10 tokens each
        per = n_words // 10
        for _ in range(10):
            recs.append((did, " ".join(["w"] * per), "en", src, per))
            did += 1
    df = spark.createDataFrame(
        recs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path + "/documents.parquet")
    out = token_budget_allocation(spark, path).collect()
    totals = {s: n for s, n in words.items()}
    budget = (sum(totals.values()) * BUDGET_NUM) // BUDGET_DEN
    ref = _waterfill_reference(totals, budget)
    got = {}
    for r in out:
        got[r["source"]] = r["alloc"]
    # funded sources get their total; capped sources all get the SAME
    # level, within one integer of the reference's (integer division of
    # the residual differs from the scan-found level by at most the
    # remainder spread across unfunded sources)
    for s in totals:
        if ref[s] == totals[s]:
            assert got[s] == totals[s], s
    capped = [s for s in totals if ref[s] < totals[s]]
    levels = {got[s] for s in capped}
    assert len(levels) == 1
    lvl = levels.pop()
    assert sum(min(totals[s], got[s]) for s in totals) <= budget
    assert abs(lvl - ref[capped[0]]) <= len(capped)


def test_curriculum_is_permutation_and_dense(spark, sf_dir):
    rows = curriculum_order(spark, sf_dir).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    assert {r["phase"] for r in rows} <= {0, 1, 2, 3}
    assert all(0 <= r["shard"] < CURRICULUM_SHARDS for r in rows)
    # pos is dense 1..n within each (phase, shard)
    groups: dict[tuple, list[int]] = {}
    for r in rows:
        groups.setdefault((r["phase"], r["shard"]), []).append(r["pos"])
    for key, ps in groups.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), key
    # phases are difficulty-ordered: max difficulty of phase p <= min of
    # phase p+2 cannot be asserted (quartile ties), but phase means must
    # be nondecreasing
    means = {}
    for p in sorted({r["phase"] for r in rows}):
        vals = [r["difficulty"] for r in rows if r["phase"] == p]
        means[p] = sum(vals) / len(vals)
    ordered = [means[p] for p in sorted(means)]
    assert ordered == sorted(ordered)


def test_dsir_selects_target_like_docs(spark, sf_dir):
    """The selected quartile must be enriched in the target domain
    (lang='en') relative to the corpus — the property DSIR exists for."""
    from dig_aggregator_core_spark.tables import load

    sel = dsir_importance_select(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = sel.join(docs, "doc_id").collect()
    n = len(joined)
    en_all = sum(1 for r in joined if r["lang"] == "en") / n
    chosen = [r for r in joined if r["selected"]]
    assert len(chosen) > 0
    # top quartile by construction: between 25% and ~26% of docs (ties)
    assert len(chosen) >= n // 4
    assert len(chosen) <= n // 3
    en_sel = sum(1 for r in chosen if r["lang"] == "en") / len(chosen)
    assert en_sel > en_all
