"""Algorithmic invariants of the round-6 batch 5-8 operators:
brute-force replays (skyline dominance, tau-b concordance, Ljung-Box Q,
spatial radius membership), decomposition laws, and metadata parity."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dig_aggregator_core_spark import registry
from dig_aggregator_core_spark.tables import load

registry.load_all()


def test_seasonal_indices_sum_near_zero(spark, sf_dir):
    # an additive seasonal component must be (near-)zero-mean within a
    # group: the dow means of a detrended series average out the trend
    rows = registry.QUERIES["timeseries_seasonal_decompose"](
        spark, sf_dir
    ).collect()
    assert rows
    by = {}
    for r in rows:
        by.setdefault(r.event_type, []).append((r.seasonal_idx, r.n_days))
    for t, idx in by.items():
        assert len(idx) == 7, f"{t}: expected 7 dow rows"
        w = sum(s * n for s, n in idx) / sum(n for _, n in idx)
        # weighted mean of detrended values is exactly the mean residual
        # of the centered series — bounded by the edge-day asymmetry
        assert abs(w) < 50.0, f"{t}: seasonal mean {w} too far from 0"


def test_skyline_dominance_bruteforce(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "source", "n_chars", "doc_id", "text"
    ).collect()
    pts = {}
    for r in docs:
        toks = [w for w in r.text.split(" ") if w]
        div = len(set(toks)) * 1000000 // max(len(toks), 1)
        pts.setdefault(r.source, []).append((r.n_chars, div))
    got = {}
    for r in registry.QUERIES["feature_pareto_skyline"](
        spark, sf_dir
    ).collect():
        got.setdefault(r.source, set()).add((r.n_chars, r.div_micro))
    for src, ps in pts.items():
        frontier = set()
        uniq = set(ps)
        for (x, y) in uniq:
            dominated = any(
                (a >= x and b >= y and (a > x or b > y)) for a, b in uniq
            )
            if not dominated:
                frontier.add((x, y))
        assert got.get(src, set()) == frontier, f"{src}: skyline mismatch"


def test_tau_b_bruteforce(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "source", "n_chars", "text"
    ).collect()
    by = {}
    for r in docs:
        toks = [w for w in r.text.split(" ") if w]
        x = min(15, r.n_chars // 64)
        y = min(15, len(toks) // 8)
        by.setdefault(r.source, []).append((x, y))
    got = {
        r.source: r
        for r in registry.QUERIES["eval_kendall_tau_b"](spark, sf_dir).collect()
    }
    import math

    for src, ps in by.items():
        c = d = 0
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                dx = ps[i][0] - ps[j][0]
                dy = ps[i][1] - ps[j][1]
                if dx * dy > 0:
                    c += 1
                elif dx * dy < 0:
                    d += 1
        n = len(ps)
        from collections import Counter

        tx2 = sum(v * (v - 1) for v in Counter(p[0] for p in ps).values())
        ty2 = sum(v * (v - 1) for v in Counter(p[1] for p in ps).values())
        if n * (n - 1) <= tx2 or n * (n - 1) <= ty2:
            assert src not in got
            continue
        tau = 2.0 * (c - d) / math.sqrt(
            (n * (n - 1) - tx2) * (n * (n - 1) - ty2)
        )
        g = got[src]
        assert (g.concordant, g.discordant) == (c, d)
        assert abs(g.tau_b - round(tau, 6)) <= 1e-6
        assert -1.0 <= g.tau_b <= 1.0


def test_footer_stats_match_data(spark, sf_dir):
    rows = registry.QUERIES["scan_parquet_footer_stats"](
        spark, sf_dir
    ).collect()
    assert rows
    d = load(spark, sf_dir, "documents")
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_chars").alias("lo"),
        F.max("n_chars").alias("hi"),
    ).collect()[0]
    assert sum(r.num_rows for r in rows) == agg.n
    assert min(r.n_chars_min for r in rows) == agg.lo
    assert max(r.n_chars_max for r in rows) == agg.hi
    assert all(r.n_nulls == 0 for r in rows)


def test_clustering_coefficient_bounds(spark, sf_dir):
    rows = registry.QUERIES["graph_clustering_coefficient"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.degree >= 2
        assert 0 <= r.lcc_micro <= 1000000
        max_tri = r.degree * (r.degree - 1) // 2
        assert 0 <= r.n_triangles  # corner credit counts each triangle once
        assert r.lcc_micro == r.n_triangles * 2000000 // (
            r.degree * (r.degree - 1)
        )
        assert r.n_triangles <= max_tri


def test_proportions_ztest_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).collect()
    conv = {}
    for r in ev:
        conv[r.user_id] = conv.get(r.user_id, 0) or (
            1 if r.event_type == "purchase" else 0
        )
    import math

    tab = {0: [0, 0], 1: [0, 0]}
    for u, c in conv.items():
        v = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        tab[v][0] += 1
        tab[v][1] += c
    (n0, c0), (n1, c1) = tab[0], tab[1]
    out = registry.QUERIES["stats_proportions_ztest"](spark, sf_dir).collect()
    if c0 + c1 == 0 or c0 + c1 == n0 + n1:
        # degenerate pooled rate (p = 0 or 1): the guard must emit
        # nothing rather than divide by zero — pinned here
        assert out == []
        return
    assert len(out) == 1
    r = out[0]
    assert (r.n0, r.c0, r.n1, r.c1) == (n0, c0, n1, c1)
    p = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    assert abs(r.z - round(z, 6)) <= 1e-6


def test_token_sort_fingerprint_permutation_invariant(spark, sf_dir):
    rows = registry.QUERIES["dedup_token_sort_fingerprint"](
        spark, sf_dir
    ).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_copies for r in rows) == n_docs
    # permutation invariance pinned directly on the canonicalizer
    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("b a c",)], "text string"
    ).select(
        F.md5(
            F.expr(
                "array_join(array_sort(filter(split(text, ' '),"
                " w -> w <> '')), ' ')"
            )
        ).alias("h")
    )
    assert df.distinct().count() == 1


def test_ljung_box_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        "event_type",
        F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").alias("di"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
    ).collect()
    daily = {}
    for r in ev:
        daily[(r.event_type, r.di)] = daily.get((r.event_type, r.di), 0) + r.c
    series = {}
    for (t, di), sc in daily.items():
        series.setdefault(t, []).append((di, sc))
    got = {
        r.event_type: r
        for r in registry.QUERIES["timeseries_ljung_box"](spark, sf_dir).collect()
    }
    for t, pts in series.items():
        pts.sort()
        xs = {di: sc for di, sc in pts}
        n = len(pts)
        s = sum(sc for _, sc in pts)
        y = {di: n * sc - s for di, sc in pts}
        d2 = sum(v * v for v in y.values())
        q = 0.0
        for k in range(1, 8):
            nk = sum(
                y[di] * y[di + k] for di in y if (di + k) in y
            )
            q += (nk / d2) ** 2 / (n - k)
        q *= n * (n + 2)
        g = got[t]
        assert g.n_days == n
        assert abs(g.q_stat - round(q, 6)) <= 1e-4


def test_spatial_join_bruteforce(spark, sf_dir):
    def xy(i):
        h = hashlib.md5(str(i).encode()).hexdigest()
        return int(h[:8], 16) % 1000000, int(h[8:16], 16) % 1000000

    users = [
        r.user_id
        for r in load(spark, sf_dir, "events").select("user_id").distinct().collect()
    ]
    sites = [
        r.o_custkey
        for r in load(spark, sf_dir, "orders")
        .filter(F.expr("o_custkey % 50 = 0"))
        .select("o_custkey")
        .distinct()
        .collect()
    ]
    expected = set()
    r2 = 7000 * 7000
    for s in sites:
        sx, sy = xy(s)
        for u in users:
            x, y = xy(u)
            d2 = (x - sx) ** 2 + (y - sy) ** 2
            if d2 <= r2:
                expected.add((s, u, d2))
    got = set(
        (r.site_id, r.point_id, r.dist2_u)
        for r in registry.QUERIES["spatial_join_radius"](spark, sf_dir).collect()
    )
    assert got == expected
    # the 3x3 neighborhood provably covers the disc: cell edge >= radius
    assert 10_000 >= 7_000


def test_ccf_lag_zero_is_pearson_and_bounded(spark, sf_dir):
    rows = {
        r.lag: r
        for r in registry.QUERIES["timeseries_cross_correlation"](
            spark, sf_dir
        ).collect()
    }
    assert rows, "fixture must produce aligned day pairs"
    for r in rows.values():
        assert -1.0 - 1e-9 <= r.ccf <= 1.0 + 1e-9
    # brute-force lag 0 as plain Pearson of the aligned daily totals
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        "event_type",
        F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").alias("di"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
    ).collect()
    import math

    daily = {}
    for r in ev:
        if r.event_type in ("view", "purchase"):
            daily[(r.event_type, r.di)] = (
                daily.get((r.event_type, r.di), 0) + r.c
            )
    days = sorted(
        d for (t, d) in daily if t == "view" and ("purchase", d) in daily
    )
    xs = [daily[("view", d)] for d in days]
    ys = [daily[("purchase", d)] for d in days]
    n = len(days)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    r0 = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert rows[0].n_pairs == n
    assert abs(rows[0].ccf - round(r0, 6)) <= 1e-6


def test_tost_equivalence_implies_diff_within_margin(spark, sf_dir):
    rows = registry.QUERIES["stats_tost_equivalence"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.equivalent:
            assert abs(r.mean_diff_cents) < r.margin_cents
        # the two one-sided statistics always bracket the margin test
        assert r.t_lower + r.t_upper > 0 or not r.equivalent


def test_woe_binning_mass_and_iv(spark, sf_dir):
    rows = registry.QUERIES["feature_woe_binning"](spark, sf_dir).collect()
    assert rows
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    n_pos = ev.filter(F.col("event_type") == "purchase").count()
    n_all = ev.count()
    assert sum(r.n_pos for r in rows) == n_pos
    assert sum(r.n_neg for r in rows) == n_all - n_pos
    iv_total = rows[0].iv_total_micro
    assert iv_total == sum(r.iv_contrib_micro for r in rows)
    # each IV term is (p-q)*ln(p/q) >= 0 up to the ±1-micro rounding
    assert all(r.iv_contrib_micro >= -1 for r in rows)
    assert iv_total >= 0


def test_markov_attribution_shares_sum_to_one(spark, sf_dir):
    rows = registry.QUERIES["attribution_markov_removal"](
        spark, sf_dir
    ).collect()
    if not rows:
        return  # degenerate fixture: no conversions
    tot = sum(r.attribution_micro for r in rows)
    # largest-remainder-free truncating shares: within len(rows) micros
    assert 1000000 - len(rows) <= tot <= 1000000
    for r in rows:
        assert 0 <= r.removal_micro <= 1000000
        assert r.p_conv_micro > 0


def test_quality_gate_rule_consistency(spark, sf_dir):
    rows = registry.QUERIES["curation_gopher_quality_gate"](
        spark, sf_dir
    ).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.pass_all == (
            r.pass_wordcount
            and r.pass_wordlen
            and r.pass_diversity
            and r.pass_stopwords
        )
        assert r.pass_wordcount == (16 <= r.n_words <= 4096)
        assert 0 <= r.ttr_micro <= 1000000
        assert 0 <= r.stop_micro <= 1000000


def test_funnel_ttc_percentiles_bruteforce(spark, sf_dir):
    out = registry.QUERIES["funnel_time_to_convert"](spark, sf_dir).collect()
    # brute-force the greedy funnel stage times
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", "ts", "event_id").collect()
    seqs = {}
    for r in ev:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_type))
    durs = []
    for u, es in seqs.items():
        es.sort()
        t1 = t2 = t3 = None
        for ts, et in es:
            if t1 is None and et == "view":
                t1 = ts
            elif t2 is None and et == "click" and t1 is not None and ts > t1:
                t2 = ts
            elif (
                t3 is None
                and et == "purchase"
                and t2 is not None
                and ts > t2
            ):
                t3 = ts
        if t3 is not None:
            durs.append(int((t3 - t1).total_seconds() // 60))
    if not durs:
        assert out == []
        return
    durs.sort()
    n = len(durs)
    r = out[0]
    assert r.n_converted == n
    for q, got in ((25, r.p25_min), (50, r.p50_min), (75, r.p75_min),
                   (90, r.p90_min)):
        k = (q * n + 99) // 100
        assert got == durs[k - 1], f"p{q}: {got} != {durs[k-1]}"
