"""Algorithmic invariants of the round-6 late-session operators —
properties the oracle hash can't express: estimator laws (KM
monotonicity, Gini bounds, Benford mass, RRF completeness, apportionment
exactness), brute-force replays on collected fixture rows, and
decomposition identities."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dig_aggregator_core_spark import registry
from dig_aggregator_core_spark.tables import load

registry.load_all()


def test_kaplan_meier_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["survival_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r.t_days,
    )
    assert rows, "fixture must produce at least one conversion time"
    prev_s, prev_risk = 1.0 + 1e-12, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9, "S(t) must be nonincreasing"
        assert 1 <= r.d_events <= r.n_risk
        if prev_risk is not None:
            assert r.n_risk < prev_risk, "at-risk count strictly shrinks"
        prev_s, prev_risk = r.survival, r.n_risk


def test_kaplan_meier_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).collect()
    first, last, purch = {}, {}, {}
    for r in ev:
        u, d = r.user_id, r.day
        first[u] = min(first.get(u, d), d)
        last[u] = max(last.get(u, d), d)
        if r.event_type == "purchase":
            purch[u] = min(purch.get(u, d), d)
    lt = [
        ((purch[u] if u in purch else last[u]) - first[u]).days
        for u in first
    ]
    obs = [(t, u in purch) for t, u in zip(lt, first)]
    # KM by hand
    grid = {}
    for t, o in obs:
        d, c = grid.get(t, (0, 0))
        grid[t] = (d + (1 if o else 0), c + 1)
    s, at_risk = 1.0, len(obs)
    expected = {}
    for t in sorted(grid):
        d, tot = grid[t]
        if d > 0:
            s = 0.0 if d == at_risk else s * (1.0 - d / at_risk)
            expected[t] = (at_risk, d, round(s, 6))
        at_risk -= tot
    got = {
        r.t_days: (r.n_risk, r.d_events, r.survival)
        for r in registry.QUERIES["survival_kaplan_meier"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(expected)
    for t in expected:
        assert got[t][0] == expected[t][0]
        assert got[t][1] == expected[t][1]
        assert abs(got[t][2] - expected[t][2]) <= 1e-6


def test_gini_bounds_and_bruteforce(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "source", "n_chars", "doc_id"
    ).collect()
    by = {}
    for r in docs:
        by.setdefault(r.source, []).append(r.n_chars)
    got = {
        r.source: r
        for r in registry.QUERIES["source_gini_concentration"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(by)
    for src, xs in by.items():
        xs = sorted(xs)
        n, tot = len(xs), sum(xs)
        g = (
            2.0 * sum((i + 1) * x for i, x in enumerate(xs))
            - (n + 1.0) * tot
        ) / (n * tot)
        assert abs(got[src].gini - round(g, 6)) <= 1e-9
        assert -1e-9 <= got[src].gini < 1.0
        assert got[src].n_docs == n and got[src].total_chars == tot


def test_benford_mass_conserved(spark, sf_dir):
    rows = registry.QUERIES["dq_benford_audit"](spark, sf_dir).collect()
    total = rows[0].total
    assert sum(r.observed for r in rows) == total
    assert all(1 <= r.digit <= 9 for r in rows)
    # Benford expectations sum to 1 over digits 1..9
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12
    assert all(r.chi2_term >= 0 for r in rows)


def test_good_turing_identities(spark, sf_dir):
    rows = registry.QUERIES["lm_good_turing"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r <= 8
        assert r.n_r >= 1
        if r.n_r_next is not None:
            assert r.r_star_micro == (
                (r.r + 1) * r.n_r_next * 1000000
            ) // r.n_r
        else:
            assert r.r_star_micro is None
        assert 0 <= r.p_unseen_micro <= 1000000


def test_rrf_completeness_and_score_law(spark, sf_dir):
    rows = registry.QUERIES["eval_rank_fusion_rrf"](spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r.query_id, []).append(r)
    for q, rs in by.items():
        assert sorted(x.fused_rank for x in rs) == list(range(1, len(rs) + 1))
        for x in rs:
            assert x.rrf_micro == 1000000 // (60 + x.rank_cos) + 1000000 // (
                60 + x.rank_q
            )
        # fused order follows rrf desc
        srt = sorted(rs, key=lambda x: (-x.rrf_micro, x.neighbor_id))
        assert [x.neighbor_id for x in srt] == [
            x.neighbor_id for x in sorted(rs, key=lambda x: x.fused_rank)
        ]


def test_jsd_bounded_and_symmetric_terms(spark, sf_dir):
    rows = registry.QUERIES["drift_js_divergence"](spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        assert r.contrib_micro >= -1, "JSD terms are nonnegative (±1 micro rounding)"
        per_source[r.source] = r.jsd_micro
    ln2_micro = int(round(math.log(2) * 1e6))
    for v in per_source.values():
        assert 0 <= v <= ln2_micro + 8, "JSD ≤ ln 2"


def test_zipf_slope_negative_r2_bounded(spark, sf_dir):
    rows = registry.QUERIES["text_zipf_fit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.zipf_slope < 0, "frequency decays with rank"
        assert 0.0 <= r.r2 <= 1.0
        assert r.n_terms >= 2


def test_winsorize_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c")
    ).collect()
    by = {}
    for r in ev:
        by.setdefault(r.event_type, []).append(r.c)
    got = {
        r.event_type: r
        for r in registry.QUERIES["feature_winsorize"](spark, sf_dir).collect()
    }
    for t, xs in by.items():
        xs = sorted(xs)
        n = len(xs)
        k_lo, k_hi = max(1, (5 * n) // 100), min(n, (95 * n + 99) // 100)
        lo, hi = xs[k_lo - 1], xs[k_hi - 1]
        wsum = sum(min(max(x, lo), hi) for x in xs)
        g = got[t]
        assert (g.lo_cents, g.hi_cents) == (lo, hi)
        assert g.winsor_mean_micro == wsum * 10000 // n
        assert g.n_clipped_low == k_lo - 1
        assert g.n_clipped_high == n - k_hi


def test_brier_decomposition_identity(spark, sf_dir):
    rows = registry.QUERIES["eval_brier_decomposition"](spark, sf_dir).collect()
    assert rows
    n_t = sum(r.n for r in rows)
    brier = rows[0].brier
    unc = rows[0].uncertainty
    rel = sum(r.rel_contrib_micro for r in rows) / 1e6
    res = sum(r.res_contrib_micro for r in rows) / 1e6
    # generalized Murphy identity: BS = REL - RES + UNC + (WBV - 2*WBC)
    # where WBV is within-bin forecast variance and WBC the within-bin
    # forecast/outcome covariance — the residual can be NEGATIVE when
    # the scorer discriminates inside a bin, but with 0.1-wide bins both
    # terms are bounded by the squared bin width, so |residual| <= 0.01
    within = brier - (rel - res + unc)
    assert abs(within) <= 0.01, f"identity residual out of bound: {within}"
    assert 0.0 <= brier <= 1.0 and 0.0 <= unc <= 0.25
    assert n_t > 0


def test_rfm_scores_and_quintile_law(spark, sf_dir):
    rows = registry.QUERIES["feature_rfm_segmentation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
        assert r.rfm == r.r_score * 100 + r.f_score * 10 + r.m_score
    # same metric value => same score (the grid guarantee ntile breaks)
    by_freq = {}
    for r in rows:
        by_freq.setdefault(r.frequency, set()).add(r.f_score)
    assert all(len(v) == 1 for v in by_freq.values())


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    rows = registry.QUERIES["text_ngram_novelty"](spark, sf_dir).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_grams
    assert first.novelty_micro == 1000000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert r.novelty_micro == r.n_novel * 1000000 // r.n_grams


def test_assortativity_bounded_and_bruteforce(spark, sf_dir):
    out = registry.QUERIES["graph_degree_assortativity"](spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct().collect()
    bucket = {}
    for row in ev:
        bucket.setdefault((row.event_type, row.h), []).append(row.user_id)
    edges = set()
    for us in bucket.values():
        us = sorted(set(us))
        for i in range(len(us)):
            for d in range(1, 4):  # the banded-edge device, band = 3
                if i + d < len(us):
                    edges.add((us[i], us[i + d]))
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(edges)
    sjk = sum(deg[u] * deg[v] for u, v in edges)
    sj = sum(deg[u] + deg[v] for u, v in edges)
    sj2 = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in edges)
    mean = sj / (2 * m)
    var = sj2 / (2 * m) - mean**2
    expected = (sjk / m - mean**2) / var
    assert r.n_edges == m and r.n_nodes == len(deg)
    assert abs(r.assortativity - round(expected, 6)) <= 1e-6


def test_theil_sen_median_is_order_statistic(spark, sf_dir):
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
        for r in registry.QUERIES["timeseries_theil_sen"](spark, sf_dir).collect()
    }
    for t, pts in series.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                num = pts[j][1] - pts[i][1]
                den = pts[j][0] - pts[i][0]
                slopes.append((num / den, num, den))
        slopes.sort()
        k = (len(slopes) + 1) // 2
        med = slopes[k - 1]
        g = got[t]
        assert g.n_pairs == len(slopes)
        assert g.slope_cents_micro == int(round(med[0] * 1e6))


def test_kruskal_wallis_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        "event_type", F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c")
    ).collect()
    vals = sorted(r.c for r in ev)
    # average ranks with ties
    rank = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2.0
        i = j
    groups = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(rank[r.c])
    n = len(vals)
    sr = sum(sum(g) ** 2 / len(g) for g in groups.values())
    h = 12.0 / (n * (n + 1)) * sr - 3 * (n + 1)
    # tie correction
    from collections import Counter

    cnt = Counter(vals)
    ties = sum(t**3 - t for t in cnt.values())
    h_adj = h / (1 - ties / (n**3 - n))
    out = registry.QUERIES["stats_kruskal_wallis"](spark, sf_dir).collect()[0]
    assert out.n == n and out.k == len(groups)
    assert abs(out.h_stat - round(h, 6)) <= 1e-5
    assert abs(out.h_adj - round(h_adj, 6)) <= 1e-5


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    rows = registry.QUERIES["sample_stratified_neyman"](spark, sf_dir).collect()
    assert rows
    assert sum(r.alloc for r in rows) == 1000
    # monotone in weight: a strictly larger weight never gets a smaller
    # allocation than a strictly smaller one by more than the +1 remainder
    srt = sorted(rows, key=lambda r: r.w_micro)
    for a, b in zip(srt, srt[1:]):
        assert b.alloc >= a.alloc - 1
