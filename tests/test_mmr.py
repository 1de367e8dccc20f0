"""MMR model properties beyond oracle parity: a pure-Python greedy
replay over independently-computed candidate/sim sets must reproduce
the fold's selections exactly, and the structural invariants
(rank-1 = max relevance, max_sim 0 at rank 1, contiguous ranks) hold."""

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F
from pyspark.sql import Window

from dig_aggregator_core_spark.operators import similarity as S


def _cand_and_sims(spark, sf_dir):
    vecs = S._vecs(spark, sf_dir).withColumn(
        "signs", F.expr(S._SIGNS_SPARK)
    )
    nb = vecs.agg(
        F.expr(
            f"GREATEST(4, LEAST({S._MAXBITS},"
            " CAST(ceil(log2(GREATEST(COUNT(*), 1) / 64.0)) AS INT)))"
        ).alias("nb")
    )
    keyed = vecs.crossJoin(F.broadcast(nb)).select(
        "vec_id", "v", "nrm",
        F.expr("substring(signs, 1, nb)").alias("bucket"),
    )
    q = keyed.filter(F.expr(S._QUERY_FILTER)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"), "bucket",
    )
    c = keyed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"), F.col("nrm").alias("cn"),
        F.col("bucket").alias("cbucket"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    cand = (
        q.join(c, (q.bucket == c.cbucket)
               & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("cos", F.expr(
            "aggregate(zip_with(qv, cv, (x, y) -> x * y),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / (qn * cn)"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= S._MMR_R)
        .select("query_id", "neighbor_id",
                F.round("cos", 6).alias("rel"), "cv", "cn")
    )
    a = cand.select("query_id", F.col("neighbor_id").alias("i"),
                    F.col("cv").alias("av"), F.col("cn").alias("an"))
    b2 = cand.select(F.col("query_id").alias("q2"),
                     F.col("neighbor_id").alias("j"),
                     F.col("cv").alias("bv"), F.col("cn").alias("bn"))
    sims = (
        a.join(b2, (a.query_id == b2.q2) & (F.col("i") != F.col("j")))
        .withColumn("sim", F.round(F.expr(
            "aggregate(zip_with(av, bv, (x, y) -> x * y),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / (an * bn)"), 6))
        .select("query_id", "i", "j", "sim")
    )
    return cand, sims


def _r6(x):
    # Spark/DuckDB ROUND is HALF_UP; Python round() is half-to-even
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    ) + 0.0


def _python_greedy(cands, sims, k):
    sel = []
    sim_of = {}
    for i, j, s in sims:
        sim_of.setdefault(i, {})[j] = s
    while len(sel) < k:
        best = None
        for cid, rel in cands:
            if any(cid == s[0] for s in sel):
                continue
            ms = (
                max(sim_of.get(cid, {}).get(s[0], None) for s in sel)
                if sel else 0.0
            )
            raw = 0.7 * rel - 0.3 * ms
            if best is None or raw > best[3] or (
                raw == best[3] and cid < best[0]
            ):
                best = (cid, rel, ms, raw)
        if best is None:
            break
        sel.append(best)
    return sel


def test_fold_matches_python_greedy_replay(spark, sf_dir):
    cand, sims = _cand_and_sims(spark, sf_dir)
    by_q_c, by_q_s = {}, {}
    for r in cand.collect():
        by_q_c.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["rel"])
        )
    for r in sims.collect():
        by_q_s.setdefault(r["query_id"], []).append(
            (r["i"], r["j"], r["sim"])
        )
    out = {}
    for r in S.mmr_diversified_topk(spark, sf_dir).collect():
        out.setdefault(r["query_id"], []).append(r)
    assert set(out) == set(by_q_c)
    for qid, cands in by_q_c.items():
        expect = _python_greedy(cands, by_q_s.get(qid, []), S._MMR_K)
        got = sorted(out[qid], key=lambda r: r["sel_rank"])
        assert [r["doc_id"] for r in got] == [e[0] for e in expect], qid
        for g, e in zip(got, expect):
            assert g["relevance"] == e[1]
            assert g["max_sim"] == _r6(e[2])
            assert g["mmr_score"] == _r6(e[3])


def test_mmr_invariants(spark, sf_dir):
    rows = S.mmr_diversified_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["sel_rank"])
        assert [r["sel_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert rs[0]["max_sim"] == 0.0
        assert rs[0]["relevance"] == max(r["relevance"] for r in rs)
        ids = [r["doc_id"] for r in rs]
        assert len(set(ids)) == len(ids)


def test_fold_matches_greedy_on_random_inputs(spark):
    """Drive the factored fold with RANDOM synthetic candidate/sim
    structures (hypothesis) and pin it to the pure-Python greedy —
    coverage beyond what the fixture's geometry exercises (ties, all
    candidates identical, negative sims, singleton sets)."""
    from hypothesis import given, settings, strategies as st

    from dig_aggregator_core_spark.operators.similarity import (
        _MMR_K,
        _mmr_fold_expr,
    )

    rel6 = st.integers(min_value=-1000000, max_value=1000000).map(
        lambda x: x / 1e6
    )

    @st.composite
    def case(draw):
        n = draw(st.integers(min_value=1, max_value=7))
        ids = draw(
            st.lists(
                st.integers(min_value=0, max_value=50),
                min_size=n, max_size=n, unique=True,
            )
        )
        cands = [(i, draw(rel6)) for i in ids]
        sims = []
        for a in range(n):
            for b in range(a + 1, n):
                s = draw(rel6)
                sims.append((ids[a], ids[b], s))
                sims.append((ids[b], ids[a], s))
        return cands, sims

    @settings(max_examples=25, deadline=None)
    @given(case())
    def check(c):
        cands, sims = c
        df = spark.createDataFrame(
            [(1, cands, sims)],
            "query_id int, cands array<struct<id: bigint, rel: double>>,"
            " simsarr array<struct<i: bigint, j: bigint, sim: double>>",
        )
        got = sorted(
            (
                (r["s"]["sel_rank"], r["s"]["id"], r["s"]["rel"],
                 r["s"]["max_sim"], r["s"]["raw"])
                for r in df.select(
                    F.explode(F.expr(_mmr_fold_expr())).alias("s")
                ).collect()
            )
        )
        expect = _python_greedy(cands, sims, _MMR_K)
        assert [g[1] for g in got] == [e[0] for e in expect]
        for g, e in zip(got, expect):
            assert g[2] == e[1] and g[3] == e[2] and g[4] == e[3]

    check()
