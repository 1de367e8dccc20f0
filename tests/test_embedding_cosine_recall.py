"""Ground-truth recall pin for dedup_embedding_cosine after the r10
adaptive-width rewrite: every original vector must still pair with its
mutated twin (vec_id + MUT_OFFSET, x*1.01+0.001) — the Hamming-1
multi-probe guarantee the fixed-width form had, now at a width that
scales with the corpus."""

from __future__ import annotations

from dig_aggregator_core_spark.operators.dedup import (
    MUT_OFFSET,
    dedup_embedding_cosine,
)
from dig_aggregator_core_spark.tables import load

SF_DIR = "/root/testdata/sf0.01"


def test_every_twin_pair_recovered(spark):
    n = load(spark, SF_DIR, "embeddings").count()
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_cosine(spark, SF_DIR).collect()
    }
    twins = {p for p in pairs if p[1] - p[0] == MUT_OFFSET}
    assert len(twins) == n, (len(twins), n)  # zero ground-truth misses
