"""pass@k model properties: exact agreement with the binomial
definition computed in exact integer arithmetic (math.comb), plus the
boundary branches."""

import math

from dig_aggregator_core_spark.operators import features as FT


def test_pass_at_k_matches_exact_binomial(spark, sf_dir):
    k = FT._PASSK_K
    rows = FT.eval_pass_at_k(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, c = r["n_attempts"], r["n_correct"]
        if c == 0:
            exact = 0.0
        elif n - c < k:
            exact = 1.0
        else:
            exact = 1.0 - math.comb(n - c, k) / math.comb(n, k)
        assert abs(r["pass_at_k"] - exact) < 5e-7, (n, c, r["pass_at_k"], exact)
        if c == 0:
            assert r["pass_at_k"] == 0.0
        assert 0.0 <= r["pass_at_k"] <= 1.0


def test_pass_at_k_degenerate_small_n(spark):
    """ADVICE r9: n < k with c = 0 must be 0.0, not 1.0 — the Chen et
    al. n-c < k shortcut assumes n >= k. Exercised directly on the
    shipping expression over a tiny frame (fixtures never hit n < k)."""
    from pyspark.sql import functions as F

    k = FT._PASSK_K
    cases = [
        (1, 3, 0, 0.0),        # n < k, zero correct -> the ADVICE bug
        (2, 3, 1, 1.0),        # n < k, any correct -> certain hit
        (3, k, 0, 0.0),        # n == k boundary, zero correct
        (4, k + 5, 0, 0.0),    # product form already 0 here; guard agrees
        (5, k + 5, k + 5, 1.0),  # all correct
    ]
    df = spark.createDataFrame(
        [(t, n, c) for t, n, c, _ in cases],
        "task_id int, n_attempts bigint, n_correct bigint",
    ).select("task_id", F.expr(FT._PASSK_EXPR).alias("pass_at_k"))
    got = {r["task_id"]: r["pass_at_k"] for r in df.collect()}
    for t, n, c, want in cases:
        assert got[t] == want, (t, n, c, got[t], want)
