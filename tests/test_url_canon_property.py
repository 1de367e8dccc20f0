"""Property tests for the URL canonicalizer (dedup_url_canonicalize's
core): on randomized messy URLs the canonical form must be

1. IDEMPOTENT — canonicalize(canonicalize(u)) == canonicalize(u): a
   canonical URL re-entering the pipeline (re-crawl of a cleaned feed)
   must map to itself, or dup groups split across passes;
2. SURFACE-INVARIANT — the four documented noise transforms (fragment,
   uppercase scheme/host + :443, trailing slash, utm_* params anywhere
   in the query) never change the canonical form.

Randomization is plain `random` with a fixed seed driving ONE Spark
pass over all generated cases (hypothesis would re-enter Spark per
example — seconds per example; one batched DataFrame checks hundreds).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators.scrub import canonicalize_urls


def _base_urls(rng: random.Random, n: int) -> list[str]:
    urls = []
    for _ in range(n):
        host = ".".join(
            "".join(rng.choices("abcdefghij", k=rng.randint(1, 6)))
            for _ in range(rng.randint(2, 3))
        )
        path = "/" + "/".join(
            "".join(rng.choices("abcxyz0123", k=rng.randint(1, 5)))
            for _ in range(rng.randint(0, 3))
        )
        params = [
            f"{''.join(rng.choices('klmnop', k=3))}={rng.randint(0, 99)}"
            for _ in range(rng.randint(0, 3))
        ]
        url = f"https://{host}{path.rstrip('/')}"
        if params:
            url += "?" + "&".join(params)
        urls.append(url)
    return urls


def _mess(rng: random.Random, url: str) -> str:
    scheme, rest = url.split("://", 1)
    # host ends at the first of '/', '?' (bases carry no '#')
    cut = len(rest)
    for ch in "/?":
        if ch in rest:
            cut = min(cut, rest.index(ch))
    host, tail = rest[:cut], rest[cut:]
    if rng.random() < 0.5:
        scheme = scheme.upper()
    if rng.random() < 0.5:
        host = host.upper()
    if rng.random() < 0.5:
        host += ":443"
    path, q, query = tail.partition("?")
    if rng.random() < 0.5 and path:
        path += "/" * rng.randint(1, 2)
    parts = query.split("&") if query else []
    for _ in range(rng.randint(0, 2)):
        parts.insert(
            rng.randint(0, len(parts)),
            f"utm_{''.join(rng.choices('stuv', k=4))}=x",
        )
    out = f"{scheme}://{host}{path}"
    if parts:
        out += "?" + "&".join(parts)
    if rng.random() < 0.5:
        out += "#frag" + str(rng.randint(0, 9))
    return out


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = canonicalize_urls(df).select("canonical_url").collect()
    return [r[0] for r in rows]


def test_canonicalizer_idempotent_and_surface_invariant(spark):
    rng = random.Random(20260814)
    bases = _base_urls(rng, 150)
    messy = [_mess(rng, u) for u in bases]
    canon1 = _canon(spark, messy)
    # surface invariance: messy forms canonicalize to their clean base
    assert canon1 == bases
    # idempotence: canonical forms are fixed points
    canon2 = _canon(spark, canon1)
    assert canon2 == canon1
