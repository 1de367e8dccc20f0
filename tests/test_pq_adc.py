"""PQ-ADC model properties the oracle compare cannot see (the r9
dp_quantile lesson: cross-engine parity proves agreement, not
semantics): seed self-encoding, recall floor vs the exact baseline,
and integer-exactness of the ADC scores."""

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators import similarity as S


def test_seed_vectors_encode_to_their_own_codeword(spark, sf_dir):
    """A codebook seed's subvector distance to its own codeword is 0 in
    every subspace, so its code vector must be [k]*M — pins the encode
    argmin (and its tie-break) end to end."""
    cb = S._pq_codebook(spark, sf_dir)
    assert len(cb) == S._PQ_K and all(len(c) == 64 for c in cb)
    vecs = S._vecs(spark, sf_dir).filter(F.expr(S._PQ_SEED_SQL))
    zv = vecs.select(
        "vec_id",
        F.expr(f"transform(v, x -> CAST(round(x * {S._PQ_SCALE}) AS BIGINT))").alias("zv"),
    ).collect()
    for r in zv:
        k = r["vec_id"] // S._PQ_SEED_MOD
        for m in range(S._PQ_M):
            sub = list(r["zv"][m * S._PQ_SUB:(m + 1) * S._PQ_SUB])
            assert sub == cb[k][m * S._PQ_SUB:(m + 1) * S._PQ_SUB]


def test_pq_recall_floor_and_shape(spark, sf_dir):
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_topk_bruteforce(spark, sf_dir).collect()
    }
    rows = S.ann_pq_adc(spark, sf_dir).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert truth
    recall = len(got & truth) / len(truth)
    # 8x16 codebook + R=15 exact rerank: far better than random; a
    # conservative floor that a broken encode/ADC cannot reach
    assert recall >= 0.3, recall
    by_q = {}
    for r in rows:
        assert isinstance(r["adc_dot"], int)  # BIGINT-exact scores
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= S._TOPK


def test_adc_scores_match_numpy_recompute(spark, sf_dir):
    """Every returned adc_dot must equal an independent numpy replay of
    quantize -> per-subspace argmin encode -> distance-table lookup —
    pins the full PQ pipeline numerically, not just its invariants."""
    import numpy as np

    from dig_aggregator_core_spark.tables import load

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    zq = {
        k: np.round(v * S._PQ_SCALE).astype(np.int64)
        for k, v in emb.items()
    }
    cb = np.array(S._pq_codebook(spark, sf_dir), dtype=np.int64)  # K x 64

    def code(vid, m):
        lo, hi = m * S._PQ_SUB, (m + 1) * S._PQ_SUB
        d = ((zq[vid][lo:hi] - cb[:, lo:hi]) ** 2).sum(axis=1)
        return int(np.argmin(d))  # np.argmin takes first min = smallest k

    rows = S.ann_pq_adc(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expect = sum(
            int(
                zq[r["query_id"]][m * S._PQ_SUB:(m + 1) * S._PQ_SUB]
                @ cb[code(r["neighbor_id"], m),
                     m * S._PQ_SUB:(m + 1) * S._PQ_SUB]
            )
            for m in range(S._PQ_M)
        )
        assert r["adc_dot"] == expect, (r, expect)
