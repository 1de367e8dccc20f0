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
        if n - c < k:
            exact = 1.0
        else:
            exact = 1.0 - math.comb(n - c, k) / math.comb(n, k)
        assert abs(r["pass_at_k"] - exact) < 5e-7, (n, c, r["pass_at_k"], exact)
        if c == 0:
            assert r["pass_at_k"] == 0.0
        assert 0.0 <= r["pass_at_k"] <= 1.0
