"""Invariant tests for the shared banded co-occurrence edge builder
(operators/graph.py banded_cooc_edges) — the one edge-derivation device
behind BFS / FoF / k-core / Adamic-Adar / assortativity / LCC. These pin
the properties every consumer relies on (and that a re-introduced
all-pairs join would break): strict low->high orientation, band reach,
output linearity in the co-occurrence rows, bucket connectivity, and
disjoint symmetrization."""

from __future__ import annotations


# integration-style tier: excluded from the default fast gate run
# (pytest.ini); the full suite runs with -m "slow or not slow"
import pytest

pytestmark = pytest.mark.slow

import datetime


from dig_aggregator_core_spark.operators.graph import (
    banded_cooc_edges,
)

BAND = 3


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory) -> str:
    """Synthetic events with two co-occurrence buckets of known
    membership: event_type 'a' hour-0 holds users 1..10 (user 1 twice —
    duplicate co-occurrence must not duplicate edges), event_type 'b'
    hour-0 holds users 100..104. Written through parquet so the builder
    exercises its real load path."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [("a", base, u) for u in range(1, 11)]
    rows.append(("a", base.replace(minute=30), 1))  # same bucket, dup user
    rows += [("b", base, u) for u in range(100, 105)]
    out = str(tmp_path_factory.mktemp("banded"))
    spark.createDataFrame(
        rows, "event_type string, ts timestamp, user_id bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def _expected_oriented() -> set[tuple[int, int]]:
    exp = set()
    for bucket in (list(range(1, 11)), list(range(100, 105))):
        for i, u in enumerate(bucket):
            for v in bucket[i + 1 : i + 1 + BAND]:
                exp.add((u, v))
    return exp


def test_oriented_edges_exact_and_lowhigh(spark, fixture_dir):
    got = {
        (r["u"], r["v"])
        for r in banded_cooc_edges(
            spark, fixture_dir, band=BAND, checkpoint=False
        ).collect()
    }
    assert got == _expected_oriented()
    assert all(u < v for u, v in got)  # orientation is strict


def test_linearity_bound(spark, fixture_dir):
    """|edges| <= band * |cooc rows| — the fan-out cap that makes the
    builder linear where all-pairs-in-bucket is quadratic. The all-pairs
    form on the size-10 bucket alone would emit 45 > the bound here."""
    n_cooc = 10 + 5  # distinct (bucket, user) memberships
    n_edges = banded_cooc_edges(
        spark, fixture_dir, band=BAND, checkpoint=False
    ).count()
    assert n_edges == len(_expected_oriented()) == 33
    assert n_edges <= BAND * n_cooc


def test_bucket_connectivity(spark, fixture_dir):
    """Consecutive ranks are always within band reach, so the band graph
    spans every bucket member — the property BFS/k-core depend on."""
    got = {
        (r["u"], r["v"])
        for r in banded_cooc_edges(
            spark, fixture_dir, band=BAND, checkpoint=False
        ).collect()
    }
    for members in (list(range(1, 11)), list(range(100, 105))):
        for a, b in zip(members, members[1:]):
            assert (a, b) in got
    # and never across buckets
    assert not any(u < 100 <= v for u, v in got)


def test_symmetric_is_disjoint_double(spark, fixture_dir):
    oriented = _expected_oriented()
    sym = {
        (r["u"], r["v"])
        for r in banded_cooc_edges(
            spark, fixture_dir, band=BAND, symmetric=True, checkpoint=False
        ).collect()
    }
    assert sym == oriented | {(v, u) for u, v in oriented}
    assert len(sym) == 2 * len(oriented)  # halves are disjoint


def test_band_one_is_rank_chain(spark, fixture_dir):
    got = {
        (r["u"], r["v"])
        for r in banded_cooc_edges(
            spark, fixture_dir, band=1, checkpoint=False
        ).collect()
    }
    exp = set()
    for members in (list(range(1, 11)), list(range(100, 105))):
        exp |= set(zip(members, members[1:]))
    assert got == exp


# ---- property form: randomized bucket memberships vs brute-force ----

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _bucketings(draw):
    """1-4 buckets, each 1-12 distinct users drawn from a shared pool
    (users may repeat ACROSS buckets — multi-bucket membership is the
    interesting overlap case), band 1-5."""
    n_buckets = draw(st.integers(1, 4))
    buckets = [
        sorted(
            draw(
                st.sets(st.integers(1, 30), min_size=1, max_size=12)
            )
        )
        for _ in range(n_buckets)
    ]
    band = draw(st.integers(1, 5))
    return buckets, band


def _brute(buckets: list[list[int]], band: int) -> set[tuple[int, int]]:
    exp = set()
    for members in buckets:
        for i, u in enumerate(members):
            for v in members[i + 1 : i + 1 + band]:
                exp.add((u, v))
    return exp


@given(_bucketings())
@settings(max_examples=8, deadline=None)
def test_property_banded_equals_bruteforce(spark, tmp_path_factory, case):
    """For arbitrary bucket memberships and band widths the builder's
    edge set equals the rank-band brute force, stays under the linearity
    bound, and symmetrization doubles it disjointly."""
    buckets, band = case
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for b, members in enumerate(buckets):
        for u in members:
            rows.append((f"t{b}", base, u))
    out = str(tmp_path_factory.mktemp("banded_prop"))
    spark.createDataFrame(
        rows, "event_type string, ts timestamp, user_id bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")

    exp = _brute(buckets, band)
    got = {
        (r["u"], r["v"])
        for r in banded_cooc_edges(
            spark, out, band=band, checkpoint=False
        ).collect()
    }
    assert got == exp
    assert len(got) <= band * sum(len(m) for m in buckets)
    sym = {
        (r["u"], r["v"])
        for r in banded_cooc_edges(
            spark, out, band=band, symmetric=True, checkpoint=False
        ).collect()
    }
    assert sym == exp | {(v, u) for u, v in exp}


def test_capped_cooc_edges_memo_and_semantics(spark, fixture_dir):
    """capped_cooc_edges == inline cap over the symmetric banded edges
    (the relation FoF and Adamic-Adar used to derive per call), and the
    second call returns the SAME memoized checkpoint object."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dig_aggregator_core_spark.operators.graph import (
        capped_cooc_edges,
    )

    cap = 2  # force the cap to bind on the 10-member bucket
    got = capped_cooc_edges(spark, fixture_dir, cap=cap)
    again = capped_cooc_edges(spark, fixture_dir, cap=cap)
    assert again is got  # session memo hit

    base = banded_cooc_edges(
        spark, fixture_dir, symmetric=True, checkpoint=False
    )
    w = Window.partitionBy("u").orderBy("v")
    exp = {
        (r["u"], r["v"])
        for r in base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .drop("rk")
        .collect()
    }
    assert {(r["u"], r["v"]) for r in got.collect()} == exp
    # per-node degree bound actually binds
    from collections import Counter

    deg = Counter(u for u, _ in exp)
    assert max(deg.values()) <= cap
