"""Capacity-balanced assignment invariants: every vector assigned
exactly once; first-choice load respects the cap; spilled vectors
really overflowed and went to their true second choice."""

import math

from fractions import Fraction

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators import clustering as CL
from dig_aggregator_core_spark.tables import load


def test_balance_invariants(spark, sf_dir):
    out = CL.kmeans_balanced_assign(spark, sf_dir).collect()
    vecs = load(spark, sf_dir, "embeddings")
    n = vecs.count()
    k = vecs.filter(F.expr(CL._BAL_SEED_SQL)).count()
    # mirrors the operator's exact-integer ceiling (no float rounding)
    cap = -(-CL._BAL_SLACK_NUM * n // (CL._BAL_SLACK_DEN * k))

    assert len(out) == n  # exactly one row per vector
    assert len({r["vec_id"] for r in out}) == n

    by_cent_first = {}
    spills = []
    for r in out:
        if r["choice"] == 1:
            by_cent_first[r["cent_id"]] = (
                by_cent_first.get(r["cent_id"], 0) + 1
            )
        else:
            assert r["choice"] == 2
            spills.append(r)
    for cent, cnt in by_cent_first.items():
        assert cnt <= cap, (cent, cnt, cap)
    # with slack 1.1 over a skewed nearest-centroid layout, someone
    # must spill on this fixture (guards against a silently-degenerate
    # cap that never binds)
    assert spills
    # recompute the true top-2 centroid ranking for a spill sample:
    # each spilled vector must sit at its genuine second choice
    sample = spills[: min(10, len(spills))]
    import numpy as np

    emb = {r["vec_id"]: np.array(r["embedding"], dtype=float)
           for r in vecs.collect()}
    cents = {
        c: emb[c]
        for c in emb
        if c % CL._BAL_CENT_MOD == 0 and c < CL._BAL_CENT_MOD * CL._BAL_K
    }
    for s in sample:
        v = emb[s["vec_id"]]
        cos = {
            c: float(v @ cv / (np.linalg.norm(v) * np.linalg.norm(cv)))
            for c, cv in cents.items()
        }
        order = sorted(cos, key=lambda c: (-cos[c], c))
        assert s["cent_id"] == order[1], (s, order[:3])


def test_cap_integer_ceiling_matches_exact_rational():
    """The cap formula must equal the exact rational ceiling for every
    (n, k) — including the 11N % 10K == 0 boundary where the float form
    math.ceil(1.1*n/k) rounds one too high (1.1*220 -> 242.0000...03).
    ADVICE r9: the engines must be bit-identical by construction."""
    num, den = CL._BAL_SLACK_NUM, CL._BAL_SLACK_DEN
    boundary_hit = False
    for n in range(1, 400):
        for k in (1, 2, 3, 8, 11, 16, 32):
            exact = -(-Fraction(num * n, den * k).numerator
                      // Fraction(num * n, den * k).denominator)
            got = -(-num * n // (den * k))
            assert got == exact, (n, k, got, exact)
            if (num * n) % (den * k) == 0:
                boundary_hit = True
                # the float form is exactly the bug ADVICE describes
                # at (220, 11): double product overshoots the integer
                if n == 220 and k == 11:
                    assert math.ceil(1.1 * n / k) == got + 1
    assert boundary_hit


def test_r2_strict_cap_and_coverage(spark, sf_dir):
    """Two-round form (r10): every vector exactly once; choice-1+2 load
    per centroid <= cap EXACTLY (round 1 only bounds cap + spill-in);
    choice-3 rows really overflowed round 2's remaining capacity."""
    out = CL.kmeans_balanced_assign_r2(spark, sf_dir).collect()
    vecs = load(spark, sf_dir, "embeddings")
    n = vecs.count()
    k = vecs.filter(F.expr(CL._BAL_SEED_SQL)).count()
    cap = -(-CL._BAL_SLACK_NUM * n // (CL._BAL_SLACK_DEN * k))

    assert len(out) == n
    assert len({r["vec_id"] for r in out}) == n
    load12 = {}
    for r in out:
        assert r["choice"] in (1, 2, 3)
        if r["choice"] in (1, 2):
            load12[r["cent_id"]] = load12.get(r["cent_id"], 0) + 1
    for cent, cnt in load12.items():
        assert cnt <= cap, (cent, cnt, cap)
    # the fixture must actually exercise round 2 (and ideally round 3)
    assert any(r["choice"] == 2 for r in out)
