"""Loaders for the driver-generated test tables (TESTDATA.md)."""

from __future__ import annotations

import itertools
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def ntz_epoch_us(col: str) -> F.Column:
    """Epoch microseconds for a naive (TIMESTAMP_NTZ) column, tz-proof.

    The fixtures' parquet stores ts as timestamp[us] with isAdjustedToUTC
    unset, which Spark reads as TIMESTAMP_NTZ; ``unix_micros`` rejects NTZ
    and a cast to TIMESTAMP would shift by the session timezone. Diffing
    against an NTZ epoch literal is pure naive arithmetic and matches
    DuckDB's ``epoch_us`` on the same values.
    """
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {col})")


def ntz_as_utc_instant(col: str) -> F.Column:
    """TIMESTAMP (instant) whose UTC wall-clock equals the naive value.

    Event-time watermarks require TIMESTAMP, not TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); treating the naive value as UTC
    is the only session-timezone-independent embedding. Invert with
    :func:`instant_as_ntz` before emitting results so oracles compare
    against the same naive values.
    """
    return F.timestamp_micros(ntz_epoch_us(col))


def instant_as_ntz(col: str) -> F.Column:
    """Inverse of :func:`ntz_as_utc_instant` (instant's UTC wall-clock as
    TIMESTAMP_NTZ), tz-proof: unix_micros on TIMESTAMP is epoch arithmetic
    and timestampadd onto an NTZ literal is naive arithmetic."""
    return F.expr(f"timestampadd(MICROSECOND, unix_micros({col}), {_EPOCH_NTZ})")


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Memo of the UNEXECUTED scan DataFrames per (session, dir, table,
# listing fingerprint) — optimization guide §5 (the driver should do
# almost no data work) / §6 (file listing is a per-scan driver cost
# worth caching). ``spark.read.parquet`` builds a fresh InMemoryFileIndex
# and re-reads the footer schema on EVERY call — measured ~95-120 ms per
# call on this host — and the registry's queries call load() 1-4 times
# per build, on every bench run. The memo caches only the lazy plan
# object: no data, no persist — every action still scans the parquet
# files, so nothing about execution or results changes (plans are
# byte-identical; see OPTIMIZATION_r12.md). The fingerprint key gives
# the same staleness contract as _SH_CACHE and friends: any file change
# under the dir misses the memo and re-lists.
_LOAD_CACHE: dict = {}

# Guards every session-memo cache that routes through evict_memo
# (ADVICE r12): two driver threads (guide §2.6 concurrent jobs, e.g.
# sink_bucketed_partitioned_write's ingest pool) can double-miss the
# same key — evict_memo's comprehension then iterates the dict while
# the other thread inserts (RuntimeError), or both pop the same stale
# key (KeyError). RLock: cache-owning helpers take it around their
# lookup+derive+insert, and evict_memo re-takes it for callers that
# invoke it directly.
_MEMO_LOCK = threading.RLock()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — filter/column pruning push down into the scan.

    `events.ts` is written as TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as long nanos (legacy conf) and convert to a
    microsecond timestamp column-side (floor division — matches DuckDB's
    ns->us truncation).
    """
    if name == "events":
        # unconditionally, BEFORE the memo lookup (ADVICE r12): a memo
        # hit must not assume the conf survived since the miss that set
        # it — idempotent one-liner, the memo still saves the listing
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fp = dir_fingerprint(sf_dir)
    key = (spark, sf_dir, fp, name)
    with _MEMO_LOCK:
        hit = _LOAD_CACHE.get(key)
        if hit is not None:
            return hit
        # keep_fingerprint: a miss on a NEW table name must not evict the
        # current listing's sibling tables (the _EDGE_CACHE param pattern)
        evict_memo(_LOAD_CACHE, spark, sf_dir, keep_fingerprint=fp)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        _LOAD_CACHE[key] = df
        return df


_SCHEMA_CACHE: dict = {}


def raw_schema(spark: SparkSession, sf_dir: str, name: str):
    """RAW parquet footer schema (no ts conversion — the streaming
    sources do their own event-time embed and need the on-disk types),
    memoized per (session, dir, listing fingerprint, table) exactly like
    ``load``. Every streaming query used to pay a fresh file listing +
    footer read (~95-120 ms) per call just to declare its readStream
    schema; the schema object is immutable metadata, so the memo changes
    nothing about execution."""
    if name == "events":
        # TIMESTAMP(NANOS) columns need the legacy long read to parse.
        # Set unconditionally BEFORE the memo lookup (ADVICE r12): the
        # conf must hold at stream-build/execution time too, not only
        # on the miss that populated the memo — idempotent one-liner,
        # the memo still saves the listing + footer read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fp = dir_fingerprint(sf_dir)
    key = (spark, sf_dir, fp, name)
    with _MEMO_LOCK:
        hit = _SCHEMA_CACHE.get(key)
        if hit is not None:
            return hit
        evict_memo(_SCHEMA_CACHE, spark, sf_dir, keep_fingerprint=fp)
        schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        _SCHEMA_CACHE[key] = schema
        return schema


def dir_fingerprint(sf_dir: str) -> tuple:
    """Cheap listing fingerprint of a corpus dir: sorted (relative path,
    mtime_ns, size) of every data file under it (one driver-side walk, no
    Spark job). Session memo caches (_SH_CACHE and friends) fold this into
    their keys so a file appended to or overwritten in the SAME dir
    invalidates the memo — previously only *switching* dirs evicted, and a
    long-lived session mutating its corpus in place read stale persisted
    data (VERDICT r7 task 3; stale-mutation case pinned in
    tests/test_session_caches.py). Non-local / unlistable paths fingerprint
    as a constant, preserving the prior switch-only eviction there.

    Failure semantics: a mid-walk OSError (file deleted during an
    in-place rewrite) returns a UNIQUE sentinel, never the non-local
    constant — an errored walk must not alias to (and later serve) an
    entry cached from a half-written dir, so memo lookups on the errored
    fingerprint always miss and retry the walk next call (ADVICE r8).
    Caveat: mtime_ns granularity is filesystem-dependent; a same-second
    same-size in-place rewrite on a coarse-mtime filesystem (e.g. 1 s
    HFS+/FAT) fingerprints identically. Local test corpora live on
    ns-granularity Linux filesystems; treat coarse-mtime mounts as
    requiring a dir swap (the pre-r8 eviction contract) instead."""
    try:
        out = []
        for root, _dirs, names in os.walk(sf_dir):
            for n in names:
                if n.startswith((".", "_")):
                    continue
                p = os.path.join(root, n)
                st = os.stat(p)
                out.append(
                    (os.path.relpath(p, sf_dir), st.st_mtime_ns, st.st_size)
                )
        return tuple(sorted(out))
    except OSError:
        # unique per call: poisons the memo key instead of hitting it
        return ("__fingerprint_oserror__", next(_FP_ERR_SEQ))


_FP_ERR_SEQ = itertools.count()


def evict_memo(cache: dict, spark, sf_dir: str, unpersist=None,
               max_dirs: int = 4, keep_fingerprint=None) -> None:
    """Shared eviction for the session memo caches keyed
    ``(spark, sf_dir, dir_fingerprint, *params)`` (_SH_CACHE and
    friends). Called on a cache MISS, before the fresh derivation.

    Two rules (ADVICE r10 — the old "evict everything for this session"
    thrashed the memo on an alternating sf0.01/sf0.1 sweep, and could
    unpersist localCheckpoint blocks out from under a still-held result
    DataFrame of the OTHER corpus, truncating its lineage):

    1. stale fingerprints of THIS corpus dir are evicted (an in-place
       mutation invalidates exactly its own entries). Caches whose keys
       carry extra params (graph._EDGE_CACHE's band/symmetric variants)
       pass `keep_fingerprint` so CURRENT-listing siblings survive a
       miss that is merely a new param combination;
    2. the number of DISTINCT corpus dirs memoized per session is
       bounded at `max_dirs` TOTAL including the current dir (the loop
       keeps at most max_dirs-1 others), oldest-inserted evicted first,
       so a long-lived session iterating many corpora still cannot
       accumulate unbounded persisted state.

    `unpersist` receives each evicted VALUE (caches store different
    shapes: a DataFrame, a tuple of DataFrames, a (df, bound) pair).

    Thread-safe under _MEMO_LOCK (re-entrant): callers that hold the
    lock around their own lookup+insert nest harmlessly; direct callers
    get the mutation guarded here (ADVICE r12)."""
    free = unpersist or (lambda _v: None)
    with _MEMO_LOCK:
        for k in [
            k for k in cache
            if k[0] is spark and k[1] == sf_dir
            and (keep_fingerprint is None or k[2] != keep_fingerprint)
        ]:
            free(cache.pop(k))
        while True:
            other_dirs: list = []
            for k in cache:
                if k[0] is spark and k[1] != sf_dir and k[1] not in other_dirs:
                    other_dirs.append(k[1])
            if len(other_dirs) < max_dirs:
                return
            oldest = other_dirs[0]
            for k in [k for k in cache if k[0] is spark and k[1] == oldest]:
                free(cache.pop(k))


_SPLIT_BYTES = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes default


def _scan_width(sf_dir: str, name: str) -> int | None:
    """Rough scan-partition count for a table from the filesystem alone
    (part-file count + 128 MiB split heuristic). Unlike
    ``df.rdd.getNumPartitions()`` this never forces plan analysis during
    query construction. Returns None for non-local paths (s3://... at
    real scale), where the many input splits already parallelize."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        files = [path]
    elif os.path.isdir(path):
        files = [
            os.path.join(root, n)
            for root, _dirs, names in os.walk(path)
            for n in names
            if not n.startswith(("_", ".")) and n.endswith(".parquet")
        ]
    else:
        return None
    try:
        return sum(1 + os.path.getsize(f) // _SPLIT_BYTES for f in files)
    except OSError:
        return None


def maybe_spread(df: DataFrame, sf_dir: str, name: str, key: str) -> DataFrame:
    """Spread a small local scan before CPU-heavy narrow maps.

    A one-file fixture scan yields 1-2 partitions and would serialize the
    md5/shingle/explode work that follows onto two cores; repartition by
    ``key`` ONLY in that case. A many-file dataset (or a remote path whose
    width we can't cheaply know) keeps its scan partitioning — at real
    scale the input splits already provide parallelism and repartitioning
    raw text would be a full shuffle for nothing."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    width = _scan_width(sf_dir, name)
    if width is not None and width < par:
        return df.repartition(par, key)
    return df
