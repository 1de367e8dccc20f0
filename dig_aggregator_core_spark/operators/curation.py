"""Corpus-curation operators — the filter/mix/shard steps between raw text
and training-data assembly (operators/training.py): repetition metrics
(Gopher-style filters), benchmark decontamination via n-gram overlap, text
normalization, per-source mixture sampling, and deterministic epoch
sharding.

Everything here is built-in column expressions (JVM/codegen) — zero Python
in any hot path — and every op is deterministic, so the DuckDB oracle
hash-checks exact values.

Scale notes (100 TB):
- repetition metrics: the only shuffle keys on (doc_id, bigram), which is
  near-unique → partial aggregation absorbs almost everything map-side.
- decontamination: the benchmark shingle set is tiny by construction (a
  held-out eval set, not the corpus) → broadcast inner join; the corpus
  side streams through map-side with no shuffle of the text itself.
- normalization / sampling / sharding: narrow per-row maps + a final
  aggregation on a tiny key (source / shard id).
- sampling and sharding derive decisions from md5(stable key), never from
  partition layout or rand() — reproducible across engines, runs, and
  repartitionings (the auditability property a training pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

DECONTAM_NGRAM = 5  # shingle width for benchmark-overlap decontamination
EPOCH_SHARDS = 8  # deterministic shard count for epoch assignment
# the per-source matrix uses a tighter shingle so the fixture grid is
# densely populated (5-grams almost never collide in the synthetic text;
# real audits pick 8-13 and the width is a parameter, not a design point)
MATRIX_NGRAM = 3

# first 8 md5 hex chars as a bigint in [0, 2^32) — the shared Spark/DuckDB
# uniform hash used for sampling decisions (same trick as
# relational.sample_hash_systematic)
_H32_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)


def _h32_spark(col: str = "doc_id"):
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")


@query(
    "text_repetition_metrics",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    b AS (
      SELECT doc_id,
             CAST(len(toks) AS DOUBLE) AS n_tokens,
             CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
             unnest(list_transform(range(1, len(toks)),
               i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]))
               AS bigram
      FROM t
    ),
    c AS (
      SELECT doc_id, n_tokens, n_uniq, bigram,
             CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM b GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id,
           ROUND(1.0 - n_uniq / n_tokens, 6) AS dup_token_frac,
           ROUND(MAX(cnt) / SUM(cnt), 6) AS top_bigram_frac,
           CAST(MAX(cnt) AS BIGINT) AS top_bigram_count
    FROM c GROUP BY doc_id, n_tokens, n_uniq
    """,
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition metrics (the Gopher-rules family of
    quality filters: Rae et al. 2021, arXiv:2112.11446 §A1.1): duplicate
    token fraction and most-frequent-bigram fraction per document.

    Everything is a per-row array expression — the top-bigram count is the
    longest run in the per-doc SORTED bigram array (array_sort + a
    run-length fold), so the whole op is one whole-stage-codegen project
    with ZERO shuffles. The explode + groupBy(doc_id, bigram) alternative
    shuffles |corpus bigrams| rows twice; this shape shuffles nothing and
    is embarrassingly parallel at any corpus size. (The oracle keeps the
    relational unnest/GROUP BY formulation — same values, independent
    derivation.) The per-doc bigram total is just n_tokens - 1. Docs with
    <2 tokens have no bigram and are excluded on both sides."""
    toks = F.split(F.col("text"), " ")
    # longest run of equal adjacent values in the sorted bigram array ==
    # the count of the most frequent bigram
    top_cnt = F.expr(
        "aggregate("
        " array_sort(transform(sequence(1, size(toks) - 1),"
        "   i -> concat(element_at(toks, CAST(i AS INT)), ' ',"
        "        element_at(toks, CAST(i + 1 AS INT))))),"
        " named_struct('prev', CAST(NULL AS STRING),"
        "              'run', CAST(0 AS BIGINT),"
        "              'best', CAST(0 AS BIGINT)),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(acc.prev IS NOT NULL AND x = acc.prev,"
        "             acc.run + 1, CAST(1 AS BIGINT)),"
        "   'best', greatest(acc.best,"
        "     IF(acc.prev IS NOT NULL AND x = acc.prev,"
        "        acc.run + 1, CAST(1 AS BIGINT)))),"
        " acc -> acc.best)"
    )
    t = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.size("toks").cast("double").alias("n_tokens"),
            F.size(F.array_distinct("toks")).cast("double").alias("n_uniq"),
            top_cnt.alias("top_cnt"),
        )
    )
    return t.select(
        "doc_id",
        F.round(1.0 - F.col("n_uniq") / F.col("n_tokens"), 6).alias(
            "dup_token_frac"
        ),
        F.round(
            F.col("top_cnt") / (F.col("n_tokens") - 1.0), 6
        ).alias("top_bigram_frac"),
        F.col("top_cnt").cast("bigint").alias("top_bigram_count"),
    )


@query(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(t) - {DECONTAM_NGRAM - 2}),
               i -> list_aggregate(list_slice(t, CAST(i AS INT),
                 CAST(i + {DECONTAM_NGRAM - 1} AS INT)), 'string_agg', ' '))))
               AS shingle
      FROM toks WHERE len(t) >= {DECONTAM_NGRAM}
    ),
    bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    )
    SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    {DECONTAM_NGRAM}-gram with a held-out benchmark set (here the
    deterministic pseudo-benchmark doc_id % 97 == 0), reporting the number
    of distinct shared n-grams per contaminated doc — the standard
    eval-leakage scrub (e.g. GPT-3 appendix C / PaLM §8) expressed
    relationally.

    Scale shape: the benchmark side is tiny by construction (an eval set),
    so its distinct shingle set broadcasts; the corpus side explodes
    shingles and probes the broadcast hash map map-side — the corpus text
    is never shuffled. The per-doc count aggregation keys on doc_id
    (near-unique → map-side partial absorbs it)."""
    toks = F.split(F.col("text"), " ")
    sh = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= DECONTAM_NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(t) - {DECONTAM_NGRAM - 1}),"
                        f" i -> array_join(slice(t, CAST(i AS INT),"
                        f" {DECONTAM_NGRAM}), ' '))"
                    )
                )
            ).alias("shingle"),
        )
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


@query(
    "decontam_source_matrix",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, len(t) - {MATRIX_NGRAM - 2}),
               i -> list_aggregate(list_slice(t, CAST(i AS INT),
                 CAST(i + {MATRIX_NGRAM - 1} AS INT)), 'string_agg', ' '))))
               AS shingle
      FROM toks WHERE len(t) >= {MATRIX_NGRAM}
    ),
    bench AS (
      SELECT DISTINCT 'bench_' || CAST(doc_id % 3 AS VARCHAR) AS benchmark,
             shingle
      FROM sh WHERE doc_id % 97 = 0
    ),
    per_doc AS (
      SELECT s.source, b.benchmark, s.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_sh
      FROM sh s JOIN bench b ON s.shingle = b.shingle
      WHERE s.doc_id % 97 <> 0
      GROUP BY 1, 2, 3
    )
    SELECT source, benchmark,
           CAST(COUNT(*) AS BIGINT) AS n_docs_contaminated,
           CAST(SUM(n_sh) AS BIGINT) AS n_shared_ngrams
    FROM per_doc GROUP BY source, benchmark
    """,
)
def decontam_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination matrix: decontam_ngram_overlap generalized
    to the source x benchmark grid a real training-data audit ships —
    for every (corpus source, benchmark) cell, how many training docs
    share at least one {MATRIX_NGRAM}-gram with that benchmark and how
    many distinct doc-shingle overlaps there are. Three deterministic
    pseudo-benchmarks stand in for the eval suites (doc_id % 97 == 0,
    split into bench_{{0,1,2}} by doc_id % 3).

    Scale shape: ONE corpus scan — shingles are exploded once and probed
    against the broadcast benchmark shingle set (all benchmarks in one
    tiny table keyed by shingle), exactly decontam_ngram_overlap's
    broadcast-probe shape; the matrix costs no more scans than the single
    flag. Aggregation is two-level so every exchange stays
    partial-aggregatable: (source, benchmark, doc_id) first — doc_id is
    near-unique so the map side absorbs it — then the final reduce onto
    the sources x benchmarks grid, which is metadata-sized at any corpus
    scale. No COUNT(DISTINCT) Expand anywhere."""
    toks = F.split(F.col("text"), " ")
    sh = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", toks.alias("t"))
        .filter(F.size("t") >= MATRIX_NGRAM)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(t) - {MATRIX_NGRAM - 1}),"
                        f" i -> array_join(slice(t, CAST(i AS INT),"
                        f" {MATRIX_NGRAM}), ' '))"
                    )
                )
            ).alias("shingle"),
        )
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(
            F.concat(
                F.lit("bench_"), (F.col("doc_id") % 3).cast("string")
            ).alias("benchmark"),
            "shingle",
        )
        .distinct()
    )
    per_doc = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("source", "benchmark", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    return per_doc.groupBy("source", "benchmark").agg(
        F.count(F.lit(1)).alias("n_docs_contaminated"),
        F.sum("n_sh").alias("n_shared_ngrams"),
    )


@query(
    "text_normalize_clean",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS cleaned,
             CAST(length(text) AS BIGINT) AS len_raw
      FROM documents
    )
    SELECT doc_id, len_raw,
           CAST(length(cleaned) AS BIGINT) AS len_clean,
           md5(cleaned) AS clean_digest
    FROM n
    """,
)
def text_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic text normalization (lowercase, strip non-alnum,
    collapse whitespace, trim) — the canonicalization pass before exact
    dedup — reporting pre/post lengths and the md5 digest of the cleaned
    text. Pure per-row regexp/string expressions: narrow map, no shuffle,
    trivially linear at any corpus size. The digest (not the cleaned text)
    is what downstream exact-dedup shuffles — 16 bytes per doc."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("bigint").alias("len_raw"),
        F.length(cleaned).cast("bigint").alias("len_clean"),
        F.md5(cleaned).alias("clean_digest"),
    )


@query(
    "mixture_weighted_sample",
    oracle=f"""
    WITH idx AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx
      FROM (SELECT DISTINCT source FROM documents)
    ),
    d AS (
      SELECT doc.doc_id, doc.source,
             0.2 + 0.15 * (idx.src_idx % 4) AS rate,
             {_H32_SQL} / 4294967296.0 AS u
      FROM documents doc JOIN idx ON doc.source = idx.source
    )
    SELECT source, ROUND(MAX(rate), 6) AS rate,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM d GROUP BY source
    """,
)
def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: sample each source at its own rate (domain reweighting
    a la DoReMi/Pile mixture weights — here a deterministic rate table
    0.2 + 0.15*(src_idx%4)). A document is kept when its md5-uniform value
    is below the source's rate, so the subset is reproducible across
    engines, runs, and partitionings, and nested: raising a rate only adds
    documents.

    The rate table derives from the DISTINCT source list (metadata-sized,
    one tiny global window) and broadcast-joins back; the keep decision is
    a per-row map; the report aggregates on the tiny source key."""
    docs = load(spark, sf_dir, "documents")
    idx = (
        docs.select("source")
        .distinct()
        .withColumn(
            "src_idx", F.row_number().over(Window.orderBy("source")) - 1
        )
        .withColumn("rate", 0.2 + 0.15 * (F.col("src_idx") % 4))
    )
    d = docs.join(F.broadcast(idx), "source").withColumn(
        "u", _h32_spark() / F.lit(4294967296.0)
    )
    return d.groupBy("source").agg(
        F.round(F.max("rate"), 6).alias("rate"),
        F.count("*").alias("n_total"),
        F.sum((F.col("u") < F.col("rate")).cast("bigint")).alias("n_kept"),
    )


@query(
    "epoch_shard_assignment",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             {_H32_SQL} AS h32,
             md5(CAST(doc_id AS VARCHAR)) AS hfull
      FROM documents
    )
    SELECT CAST(h32 % {EPOCH_SHARDS} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           arg_min(doc_id, hfull) AS first_doc,
           arg_max(doc_id, hfull) AS last_doc
    FROM h GROUP BY 1
    """,
)
def epoch_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: assign every document to one of
    {EPOCH_SHARDS} shards by md5 hash and order within a shard by the full
    md5 hex — the shuffle-by-hash pattern that gives a reproducible global
    training order without ever sorting the corpus globally (each shard
    sorts independently; shard files are then read round-robin).

    The shard assignment is a per-row map; the summary (per-shard count,
    source spread, first/last doc in hash order via min_by/max_by)
    aggregates on the {EPOCH_SHARDS}-value shard key with map-side
    partials. No global window anywhere."""
    h = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        _h32_spark().alias("h32"),
        F.md5(F.col("doc_id").cast("string")).alias("hfull"),
    )
    return h.groupBy(
        (F.col("h32") % EPOCH_SHARDS).cast("bigint").alias("shard_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.min_by("doc_id", "hfull").alias("first_doc"),
        F.max_by("doc_id", "hfull").alias("last_doc"),
    )


_WSWOR_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         -ln(({_H32_SQL} + 1) / 4294967297.0) / n_chars AS es_key
  FROM documents
  WHERE n_chars > 0
),
ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY ROUND(es_key, 9), doc_id) AS rk
  FROM keyed
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS k,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM ranked WHERE rk <= 10
GROUP BY lang
"""


@query("sample_weighted_without_replacement", oracle=_WSWOR_ORACLE)
def sample_weighted_without_replacement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis): each
    row draws key = -ln(u)/w (exponential with rate = weight) and the k
    smallest keys per stratum are the sample — inclusion probability
    proportional to weight, single pass, no sequential draws. The
    textbook distributed form: keys are a per-row map, selection is a
    per-stratum top-k (WindowGroupLimit prunes rank > k before any
    sort-merge), and at 100 TB the same keys feed a global
    TakeOrdered(k) with no stratification.

    Determinism across engines: u derives from the md5 hash (the library
    convention — reproducible, partitioning-invariant) and ranking
    compares ROUND(key, 9) with a doc_id tie-break, so a last-ulp ln()
    difference between libms can never flip the selected set. Weight =
    n_chars: longer documents proportionally likelier — the
    length-balanced corpus subset shape.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (_h32_spark() + 1) / F.lit(4294967297.0)
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        (-F.log(u) / F.col("n_chars")).alias("es_key"),
    )
    w = Window.partitionBy("lang").orderBy(F.round("es_key", 9), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .groupBy("lang")
        .agg(
            F.count("*").alias("k"),
            F.sum("n_chars").alias("sampled_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_RESERVOIR_K = 100

_RESERVOIR_ORACLE = f"""
SELECT doc_id, lang, n_chars,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {_RESERVOIR_K}
"""


@query("sample_reservoir_priority", oracle=_RESERVOIR_ORACLE)
def sample_reservoir_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed reservoir sample (VERDICT r8 task 4b): a GLOBAL
    uniform k-sample in ONE pass with NO repartition of the data —
    priority sampling (Vitter's reservoir in its order-statistics form:
    assign each row a uniform priority, keep the k smallest). The
    priority is the md5 hash, so the sample is deterministic,
    partitioning-invariant, and append-stable in expectation; uniformity
    follows because the hash order is uniform over keys.

    Physical shape is the whole point: orderBy(priority).limit(k)
    compiles to TakeOrderedAndProject — every scan task keeps a local
    k-element heap (a per-partition reservoir) and the driver merges
    P*k candidates, so a 100 TB corpus is sampled with zero shuffle
    exchange and O(k) memory per task. Contrast df.sample(): fraction-
    based (no exact k), nondeterministic under retries, and a global
    exact-k via sample+count needs two passes. The weighted companion is
    sample_weighted_without_replacement (Efraimidis-Spirakis keys, same
    top-k physical form per stratum)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias(
                "priority"
            ),
        )
        .orderBy("priority", "doc_id")
        .limit(_RESERVOIR_K)
    )


_CHUNK_W, _CHUNK_S = 200, 150  # window / stride in chars (50-char overlap)

_CHUNK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         1 + CAST(floor((greatest(length(text) - {_CHUNK_W}, 0)
                         + {_CHUNK_S} - 1) / {_CHUNK_S}) AS INT) AS n_chunks
  FROM documents
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS chunk_idx,
       CAST(length(substr(text, (i - 1) * {_CHUNK_S} + 1, {_CHUNK_W}))
            AS INT) AS chunk_len,
       md5(substr(text, (i - 1) * {_CHUNK_S} + 1, {_CHUNK_W})) AS chunk_md5
FROM d, LATERAL unnest(generate_series(1, n_chunks)) AS t(i)
"""


@query("doc_chunk_overlap", oracle=_CHUNK_ORACLE)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking ({w}-char windows, {s}-char
    stride) — the RAG/embedding-prep splitter: every char of a document is
    covered, consecutive chunks share {o} chars of context, and chunk ids
    are (doc_id, chunk_idx), stable across runs. The final chunk is
    whatever remains (shorter than the window; never empty because chunk
    count comes from ceil((len - w)/s) + 1).

    Pure per-row generation: sequence + transform + posexplode, zero
    shuffle, whole-stage codegen end to end; chunk payloads are emitted
    as md5 digests (+ length) so the row stays narrow for the comparison
    harness — a real pipeline would carry the substring itself and write
    partitioned by a hash of doc_id."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (
            1
            + F.floor(
                (
                    F.greatest(F.length("text") - _CHUNK_W, F.lit(0))
                    + _CHUNK_S
                    - 1
                )
                / _CHUNK_S
            )
        ).cast("int").alias("n_chunks"),
    )
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, n_chunks),"
                f" i -> substring(text, (i - 1) * {_CHUNK_S} + 1, {_CHUNK_W}))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.length("chunk").cast("int").alias("chunk_len"),
        F.md5("chunk").alias("chunk_md5"),
    )


doc_chunk_overlap.__doc__ = doc_chunk_overlap.__doc__.format(
    w=_CHUNK_W, s=_CHUNK_S, o=_CHUNK_W - _CHUNK_S
)


_TEMP_ALPHA = 0.7  # mixture temperature (0 = uniform, 1 = proportional)


@query(
    "mixture_temperature_reweight",
    oracle=f"""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ),
    t AS (
      SELECT SUM(n_docs) AS total,
             SUM(POW(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA})) AS z
      FROM c
    )
    SELECT c.source, c.n_docs,
           ROUND(CAST(c.n_docs AS DOUBLE) / t.total, 6) AS p_raw,
           ROUND(POW(CAST(c.n_docs AS DOUBLE), {_TEMP_ALPHA}) / t.z, 6)
             AS p_temp,
           ROUND((POW(CAST(c.n_docs AS DOUBLE), {_TEMP_ALPHA}) / t.z)
                 / (CAST(c.n_docs AS DOUBLE) / t.total), 6)
             AS epoch_boost
    FROM c, t
    """,
)
def mixture_temperature_reweight(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual/multi-source
    sampling rule from XLM-R / mT5: q_i ∝ p_i^α with α={a}): per source,
    the raw corpus share, the temperature-flattened sampling share, and
    the epoch boost (q_i/p_i — how many times more often a small source's
    docs are seen than proportional sampling would show them). This is
    the report that sets the sampling weights mixture_weighted_sample
    then executes.

    Plan: ONE corpus scan reduced map-side to |sources| counts; the
    normalizers are a 1-row frame (Σn, Σn^α) broadcast back onto the
    sources-sized frame — the same metadata-join shape as
    epoch_shard_assignment. Rounding to 6dp absorbs the one
    non-deterministic step (the 20-term double sums' order)."""
    c = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    t = c.agg(
        F.sum("n_docs").alias("total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), _TEMP_ALPHA)).alias("z"),
    )
    q = F.pow(F.col("n_docs").cast("double"), _TEMP_ALPHA) / F.col("z")
    p = F.col("n_docs").cast("double") / F.col("total")
    return c.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.round(p, 6).alias("p_raw"),
        F.round(q, 6).alias("p_temp"),
        F.round(q / p, 6).alias("epoch_boost"),
    )


mixture_temperature_reweight.__doc__ = (
    mixture_temperature_reweight.__doc__.format(a=_TEMP_ALPHA)
)


_GINI_ORACLE = """
WITH r AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS i
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND((2.0 * CAST(SUM(i * n_chars) AS DOUBLE)
              - (COUNT(*) + 1.0) * CAST(SUM(n_chars) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE)
                * CAST(SUM(n_chars) AS DOUBLE)), 6) + 0.0 AS gini
FROM r GROUP BY source
"""


@query("source_gini_concentration", oracle=_GINI_ORACLE)
def source_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini coefficient of document-size concentration — the
    inequality diagnostic a mixture designer reads BEFORE trusting a
    per-source token budget: a source whose byte mass hides in a few
    huge documents (gini → 1) needs document-level capping before the
    epoch sharder can honor its mixture weight, while an even source
    (gini → 0) can be sampled uniformly. Uses the exact rank formula
    G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x) over ascending sizes —
    tie-invariant because equal x values contribute the same rank-sum
    under any permutation, and the (n_chars, doc_id) tiebreak makes both
    engines' rankings identical anyway.

    Plan: the rank window and the final aggregation BOTH key on source,
    so the corpus shuffles exactly once and the groupBy is partition-
    local after the window's exchange (the user_activity_streaks
    exchange-reuse shape). The rank moment Σ i·x stays exact BIGINT —
    bound n·max(i)·max(x) ≈ n²·x̄, inside BIGINT to ~3e6 docs/source at
    1 MB averages; past that lift to DECIMAL(38,0) (the
    pca_power_component device). Only the closed-form ratio is a double.
    Reference analog: frequencyAnalysis.py's per-group summary layer
    (frequencyAnalysis.py:31-35) as a concentration statistic.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "source", "n_chars", F.row_number().over(w).alias("i")
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (
            F.round(
                (
                    F.lit(2.0)
                    * F.sum(F.expr("i * n_chars")).cast("double")
                    - (F.count(F.lit(1)) + F.lit(1.0))
                    * F.sum("n_chars").cast("double")
                )
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.sum("n_chars").cast("double")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("gini"),
    )


_NEYMAN_BUDGET = 1000  # total sample size to apportion


_NEYMAN_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sc,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                  * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sc2
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type
),
w AS (
  SELECT event_type, n_h,
         CAST(ROUND(n_h * sqrt(
             (CAST(n_h AS DOUBLE) * sc2 - CAST(sc AS DOUBLE) * sc)
             / (CAST(n_h AS DOUBLE) * (n_h - 1))) * 1000000, 0)
           AS BIGINT) AS w_micro
  FROM s WHERE n_h >= 2
),
t AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS tot FROM w),
q AS (
  SELECT event_type, n_h, w_micro,
         ({_NEYMAN_BUDGET} * w_micro) // t.tot AS base,
         ({_NEYMAN_BUDGET} * w_micro) % t.tot AS rem
  FROM w CROSS JOIN t
),
lo AS (
  SELECT CAST({_NEYMAN_BUDGET} - SUM(base) AS BIGINT) AS leftover FROM q
),
rk AS (
  SELECT q.*, lo.leftover,
         ROW_NUMBER() OVER (ORDER BY rem DESC, event_type) AS rr
  FROM q CROSS JOIN lo
)
SELECT event_type, n_h, w_micro,
       CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM rk
"""


@query("sample_stratified_neyman", oracle=_NEYMAN_ORACLE)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation (Neyman 1934): split a fixed sampling
    budget of {b} across strata proportional to N_h·S_h — the
    minimum-variance design for a stratified mean, vs the proportional
    allocation sample_stratified_hash implicitly uses (high-variance
    strata deserve MORE than their population share). The integer
    apportionment uses the largest-remainder method, so allocations sum
    to the budget EXACTLY.

    Determinism: stratum weights quantize to integer micros at the one
    sqrt site (exact integer variance moments underneath — the
    stats-family device), after which quota, base (DIV), remainder
    (MOD), and the remainder ranking are ALL exact integer arithmetic —
    no float enters the apportionment, so both engines apportion
    identically even where quotas tie.

    Scale shape: one scan collapses map-side to per-stratum moments (a
    k-row grid); the total, leftover, and remainder rank all operate on
    that grid (the dq_benford finale). The allocation table then drives
    the actual draw via the existing deterministic hash-rank sampler
    (sample_k_per_group), k_h = alloc. Reference analog:
    frequencyAnalysis.py's per-group summary layer
    (frequencyAnalysis.py:31-35) as a sampling design.
    """
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_h"),
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("sc"),
            F.sum(
                F.expr(
                    "CAST(ROUND(value * 100) AS BIGINT)"
                    " * CAST(ROUND(value * 100) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("sc2"),
        )
    )
    w = s.filter(F.col("n_h") >= 2).select(
        "event_type",
        "n_h",
        F.expr(
            "CAST(ROUND(n_h * sqrt("
            "(CAST(n_h AS DOUBLE) * sc2 - CAST(sc AS DOUBLE) * sc)"
            " / (CAST(n_h AS DOUBLE) * (n_h - 1))) * 1000000, 0)"
            " AS BIGINT)"
        ).alias("w_micro"),
    ).localCheckpoint()  # k-row grid feeds total + quota + leftover
    t = w.agg(F.sum("w_micro").cast("bigint").alias("tot"))
    q = w.crossJoin(F.broadcast(t)).select(
        "event_type",
        "n_h",
        "w_micro",
        F.expr(f"({_NEYMAN_BUDGET} * w_micro) DIV tot").alias("base"),
        F.expr(f"({_NEYMAN_BUDGET} * w_micro) % tot").alias("rem"),
    )
    lo = q.agg(
        (F.lit(_NEYMAN_BUDGET) - F.sum("base"))
        .cast("bigint")
        .alias("leftover")
    )
    rk = q.crossJoin(F.broadcast(lo)).withColumn(
        "rr",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col("event_type"))
        ),
    )
    return rk.select(
        "event_type",
        "n_h",
        "w_micro",
        F.expr(
            "CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("alloc"),
    )


sample_stratified_neyman.__doc__ = sample_stratified_neyman.__doc__.format(
    b=_NEYMAN_BUDGET
)


_GATE_ORACLE = """
WITH f AS (
  SELECT doc_id, source, n_chars,
         list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
),
m AS (
  SELECT doc_id, source,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST((n_chars * 1000000) // greatest(len(w), 1) AS BIGINT)
           AS mean_wordlen_micro,
         CAST((len(list_distinct(w)) * 1000000)
              // greatest(len(w), 1) AS BIGINT) AS ttr_micro,
         CAST((len(list_filter(w, x -> x IN ('the','a','of','to','and',
             'in','is','for','on','that'))) * 1000000)
              // greatest(len(w), 1) AS BIGINT) AS stop_micro
  FROM f
),
g AS (
  SELECT *,
         n_words BETWEEN 16 AND 4096 AS pass_wordcount,
         mean_wordlen_micro BETWEEN 2000000 AND 12000000
           AS pass_wordlen,
         ttr_micro >= 200000 AS pass_diversity,
         stop_micro >= 10000 AS pass_stopwords
  FROM m
)
SELECT doc_id, source, n_words, mean_wordlen_micro, ttr_micro,
       stop_micro, pass_wordcount, pass_wordlen, pass_diversity,
       pass_stopwords,
       pass_wordcount AND pass_wordlen AND pass_diversity
         AND pass_stopwords AS pass_all
FROM g
"""


@query("curation_gopher_quality_gate", oracle=_GATE_ORACLE)
def curation_gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite rule-based quality gate (the Gopher / C4 / RefinedWeb
    filter battery, Rae et al. 2021 §A1): per document, the NAMED rule
    verdicts — word-count band, mean-word-length band, type-token-ratio
    floor, stopword-presence floor — plus the conjunction. Emitting each
    rule's verdict separately (not just pass_all) is the operational
    form: curation teams tune thresholds per rule and audit which rule
    kills how much of each source (one groupBy away from this output).
    Complements the scalar quality_classifier_score (this is the
    hard-gate form) and entropy_filter (the information-theoretic one).

    Exactness: every metric is an exact integer micro ratio (truncating
    DIV on nonnegative counts), every verdict an integer comparison —
    no floats at all. The stopword list is a 10-word literal, identical
    in both engines.

    Scale: one scan, per-row codegen array expressions, zero shuffle —
    embarrassingly parallel (the quality_classifier_score profile).
    Reference analog: the reference's variant QC layer
    (frequencyAnalysis.py:31-35) as a rule battery.
    """
    d = load(spark, sf_dir, "documents")
    stop = "('the','a','of','to','and','in','is','for','on','that')"
    m = d.select(
        "doc_id",
        "source",
        F.expr("filter(split(text, ' '), w -> w <> '')").alias("w"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    ).select(
        "doc_id",
        "source",
        F.expr("CAST(size(w) AS BIGINT)").alias("n_words"),
        "n_chars",
        F.expr(
            "CAST((n_chars * 1000000) DIV greatest(size(w), 1)"
            " AS BIGINT)"
        ).alias("mean_wordlen_micro"),
        F.expr(
            "CAST((size(array_distinct(w)) * 1000000)"
            " DIV greatest(size(w), 1) AS BIGINT)"
        ).alias("ttr_micro"),
        F.expr(
            f"CAST((size(filter(w, x -> x IN {stop})) * 1000000)"
            " DIV greatest(size(w), 1) AS BIGINT)"
        ).alias("stop_micro"),
    )
    g = m.select(
        "*",
        F.expr("n_words BETWEEN 16 AND 4096").alias("pass_wordcount"),
        F.expr(
            "mean_wordlen_micro BETWEEN 2000000 AND 12000000"
        ).alias("pass_wordlen"),
        F.expr("ttr_micro >= 200000").alias("pass_diversity"),
        F.expr("stop_micro >= 10000").alias("pass_stopwords"),
    )
    return g.select(
        "doc_id",
        "source",
        "n_words",
        "mean_wordlen_micro",
        "ttr_micro",
        "stop_micro",
        "pass_wordcount",
        "pass_wordlen",
        "pass_diversity",
        "pass_stopwords",
        F.expr(
            "pass_wordcount AND pass_wordlen AND pass_diversity"
            " AND pass_stopwords"
        ).alias("pass_all"),
    )
