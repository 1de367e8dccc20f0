"""Algorithmic invariants of the round-6b operators — properties the
oracle hash can't express: brute-force replays of the rank/median/CUSUM
statistics on collected fixture rows, interval-algebra laws, WordPiece
reconstruction, and distribution-distance bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dig_aggregator_core_spark import registry
from dig_aggregator_core_spark.tables import load

registry.load_all()


def _cents_by_type(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select("event_type", F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"))
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r.event_type, []).append(r.c)
    return by


def test_welch_matches_bruteforce(spark, sf_dir):
    by = _cents_by_type(spark, sf_dir)
    out = {
        r.event_type: r
        for r in registry.QUERIES["stats_welch_ttest"](spark, sf_dir).collect()
    }
    yb = by["view"]
    mb = sum(yb) / len(yb)
    vb = sum((x - mb) ** 2 for x in yb) / (len(yb) - 1)
    for t, xs in by.items():
        if t == "view":
            continue
        ma = sum(xs) / len(xs)
        va = sum((x - ma) ** 2 for x in xs) / (len(xs) - 1)
        se = va / len(xs) + vb / len(yb)
        t_ref = (ma - mb) / math.sqrt(se)
        assert abs(out[t].t_welch - t_ref) < 1e-4, t
        assert out[t].df_welch > 1


def test_mann_whitney_matches_bruteforce(spark, sf_dir):
    by = _cents_by_type(spark, sf_dir)
    out = {
        r.event_type: r
        for r in registry.QUERIES["stats_mann_whitney_u"](spark, sf_dir).collect()
    }
    yb = by["view"]
    for t, xs in by.items():
        if t == "view":
            continue
        # U = #(x > y) + 0.5 * #(x == y), doubled to stay integer
        u2 = 0
        ys = sorted(yb)
        import bisect

        for x in xs:
            lt = bisect.bisect_left(ys, x)
            eq = bisect.bisect_right(ys, x) - lt
            u2 += 2 * lt + eq
        assert out[t].u2 == u2, t
        assert out[t].n_x == len(xs) and out[t].n_y == len(yb)


def test_moving_median_matches_bruteforce(spark, sf_dir):
    from dig_aggregator_core_spark.operators.windows import _MED_FRAME

    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
        )
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    ref = {}
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for i, r in enumerate(rows):
            fr = sorted(x.c for x in rows[max(0, i - _MED_FRAME) : i + 1])
            s = len(fr)
            med = fr[s // 2] if s % 2 else (fr[s // 2 - 1] + fr[s // 2]) / 2.0
            ref[r.event_id] = round(med / 100.0, 6)
    out = registry.QUERIES["window_moving_median"](spark, sf_dir).collect()
    assert len(out) == len(ref)
    for r in out:
        assert abs(r.moving_median - ref[r.event_id]) < 1e-9


def test_interval_coalesce_islands_disjoint(spark, sf_dir):
    df = registry.QUERIES["interval_coalesce"](spark, sf_dir)
    rows = df.collect()
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    by_user = {}
    for r in rows:
        assert r.start_us < r.end_us and r.span_us == r.end_us - r.start_us
        by_user.setdefault(r.user_id, []).append(r)
    for u, isl in by_user.items():
        isl.sort(key=lambda r: r.island)
        for a, b in zip(isl, isl[1:]):
            assert a.end_us < b.start_us, f"islands touch for user {u}"


def test_cusum_peak_matches_bruteforce(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            "ts",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
        )
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r.event_type, []).append(r)
    out = {
        r.event_type: r
        for r in registry.QUERIES["timeseries_changepoint_cusum"](
            spark, sf_dir
        ).collect()
    }
    for t, rs in by.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        n, tot = len(rs), sum(r.c for r in rs)
        cum, best = 0, None
        for k, r in enumerate(rs, start=1):
            cum += r.c
            num = n * cum - k * tot
            key = (abs(num), -k)  # max |num|, earliest rn on ties
            if best is None or key > best[0]:
                best = (key, k, num)
        assert out[t].peak_rn == best[1], t
        assert abs(out[t].peak_dev - round(abs(best[2]) / n / 100.0, 6)) < 1e-9
        assert out[t].direction == (1 if best[2] > 0 else -1)


def test_t_closeness_bounds_and_coverage(spark, sf_dir):
    df = registry.QUERIES["privacy_t_closeness"](spark, sf_dir)
    rows = df.collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_rows for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.tvd_micro <= 1_000_000
        assert r.status in ("t_close", "at_risk")


def test_neighborhood_2hop_excludes_1hop(spark, sf_dir):
    # brute-force the banded edge relation and FoF counts at fixture scale
    from dig_aggregator_core_spark.operators.graph import _BFS_BAND, _FOF_CAP

    cooc = (
        load(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
        .collect()
    )
    buckets = {}
    for r in cooc:
        buckets.setdefault((r.event_type, r.h), []).append(r.user_id)
    edges = set()
    for members in buckets.values():
        members.sort()
        for i, u in enumerate(members):
            for v in members[i + 1 : i + 1 + _BFS_BAND]:
                edges.add((u, v))
                edges.add((v, u))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    # the op caps each node's adjacency to its _FOF_CAP smallest ids
    adj = {u: set(sorted(vs)[:_FOF_CAP]) for u, vs in adj.items()}
    out = registry.QUERIES["graph_neighborhood_2hop"](spark, sf_dir).collect()
    assert len(out) == len(adj)
    for r in out:
        n1 = adj[r.user_id]
        two = set()
        for v in n1:
            two |= adj[v]
        two.discard(r.user_id)
        assert r.deg1 == len(n1)
        assert r.deg2_new == len(two - n1)
        assert r.reach2 == r.deg1 + r.deg2_new


def test_bleu_bounds(spark, sf_dir):
    rows = registry.QUERIES["eval_bleu_ngram_precision"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.p2_micro <= r.p1_micro <= 1_000_000  # p2 clips harder
        assert 0 <= r.bp_micro <= 1_000_000
        assert 0.0 <= r.bleu2 <= 1.0
        assert r.n_pairs > 0


def test_wordpiece_reconstruction_and_greedy(spark, sf_dir):
    from dig_aggregator_core_spark.operators.training import _WP_VOCAB

    df = registry.QUERIES["tokenizer_wordpiece_apply"](spark, sf_dir)
    rows = df.collect()
    vocab = set(_WP_VOCAB)
    for r in rows:
        assert r.n_tokens >= r.n_words > 0
        assert 0 <= r.n_unk_words <= r.n_words
        pieces = r.first_word_tokens.split("~")
        if pieces != ["[UNK]"]:
            # every piece is vocab, continuations after the head, and
            # stripping markers reconstructs a word prefix-greedily
            assert pieces[0] in vocab and not pieces[0].startswith("##")
            for p in pieces[1:]:
                assert p in vocab and p.startswith("##")
    # the corpus exercises BOTH paths: some UNK words (##w removed from
    # the vocab on purpose) and some multi-piece merges
    assert any(r.n_unk_words > 0 for r in rows)
    assert any("~" in r.first_word_tokens for r in rows)


def test_kappa_between_po_and_chance(spark, sf_dir):
    r = registry.QUERIES["eval_cohens_kappa"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert 0 < r.agree <= r.n
    assert 0 <= r.pe_micro < r.po_micro <= 1_000_000
    # kappa < po (chance subtraction can only lower), and consistent
    assert r.kappa_micro < r.po_micro
    ref = ((r.po_micro - r.pe_micro) * 1_000_000) // (1_000_000 - r.pe_micro)
    assert r.kappa_micro == ref


def test_target_encoding_loo_excludes_self(spark, sf_dir):
    from dig_aggregator_core_spark.tables import load

    rows = (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "event_type",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
        )
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r.event_type, []).append(r)
    out = registry.QUERIES["feature_target_encoding_loo"](spark, sf_dir)
    got = {r.event_id: r.te_loo_micro for r in out.collect()}
    for t, rs in by.items():
        s, n = sum(r.c for r in rs), len(rs)
        for r in rs:
            assert got[r.event_id] == ((s - r.c) * 1_000_000) // (n - 1)


def test_kcore_matches_bruteforce_peel(spark, sf_dir):
    from dig_aggregator_core_spark.operators.graph import (
        _BFS_BAND,
        _KCORE_K,
        _KCORE_R,
    )
    from dig_aggregator_core_spark.tables import load

    cooc = (
        load(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
        .collect()
    )
    buckets = {}
    for r in cooc:
        buckets.setdefault((r.event_type, r.h), []).append(r.user_id)
    edges = set()
    for members in buckets.values():
        members.sort()
        for i, u in enumerate(members):
            for v in members[i + 1 : i + 1 + _BFS_BAND]:
                edges.add((u, v))
                edges.add((v, u))
    for _ in range(_KCORE_R):
        deg = {}
        for u, _v in edges:
            deg[u] = deg.get(u, 0) + 1
        keep = {u for u, d in deg.items() if d >= _KCORE_K}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    ref = {}
    for u, _v in edges:
        ref[u] = ref.get(u, 0) + 1
    out = registry.QUERIES["graph_kcore_decompose"](spark, sf_dir).collect()
    assert {r.user_id: r.degree for r in out} == ref
    # peeling never INCREASES degree vs the raw graph, and survivors
    # meet the k bound after every completed round
    assert all(d >= _KCORE_K for d in ref.values()) or _KCORE_R == 0


def test_stream_interval_coalesce_matches_batch_islands(spark, sf_dir):
    # the streaming twin must produce the batch op's islands (modulo the
    # half-open exact-touch rule, absent from this fixture): same island
    # count per user, same covered span
    batch = registry.QUERIES["interval_coalesce"](spark, sf_dir).collect()
    stream = registry.QUERIES["stream_interval_coalesce"](
        spark, sf_dir
    ).collect()
    assert len(stream) == len(batch)
    b_n = {}
    for r in batch:
        b_n[r.user_id] = b_n.get(r.user_id, 0) + 1
    s_n = {}
    for r in stream:
        s_n[r.user_id] = s_n.get(r.user_id, 0) + 1
    assert s_n == b_n


def test_asof_tolerance_is_filtered_asof(spark, sf_dir):
    # tolerance keeps left cardinality and only NULLs stale matches: the
    # non-null rows must be a subset of the untolerated as-of's matches
    base = {
        r.click_id: r.last_purchase_value
        for r in registry.QUERIES["asof_join"](spark, sf_dir).collect()
    }
    tol = registry.QUERIES["asof_join_tolerance"](spark, sf_dir).collect()
    assert len(tol) == len(base)
    hits = 0
    for r in tol:
        if r.within_tolerance:
            hits += 1
            assert r.last_purchase_value == base[r.click_id]
        else:
            assert r.last_purchase_value is None
    assert 0 < hits < len(tol)  # the 6h window both keeps and drops some


def test_holt_matches_bruteforce(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r.event_type, []).append(r)
    out = {
        r.event_type: r
        for r in registry.QUERIES["timeseries_holt_linear"](
            spark, sf_dir
        ).collect()
    }
    for t, rs in by.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        xs = [r.value for r in rs]
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[2:]:
            l2 = 0.3 * x + 0.7 * (l + b)
            b = 0.2 * (l2 - l) + 0.8 * b
            l = l2
        assert abs(out[t].level - round(l, 6)) < 1e-6, t
        assert abs(out[t].trend - round(b, 6)) < 1e-6, t
        assert out[t].n_events == len(xs)


def test_phonetic_key_merges_noise_splits_changes(spark, sf_dir):
    rows = registry.QUERIES["dedup_phonetic_key"](spark, sf_dir).collect()
    by_key = {r.pkey: r for r in rows}
    # vowel noise and doubled consonants collapse into the base key
    # (machinery + maachinery + machinry share 'mchn'), while the m->n
    # consonant change splits off its own block
    assert "mchn" in by_key and by_key["mchn"].n_surface_forms >= 2
    assert "nchn" in by_key  # the genuine skeleton change is separated
    for r in rows:
        assert r.n_candidate_pairs == r.n_rows * (r.n_rows - 1) // 2
        assert 1 <= len(r.pkey) <= 4
