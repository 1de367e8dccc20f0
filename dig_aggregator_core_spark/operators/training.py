"""Training-data assembly operators — the last-mile steps an LLM data
pipeline runs after curation/dedup: packing documents into fixed
token-budget chunks, deterministic source interleaving (data mixing), and
int8 embedding quantization.

All three are pure DataFrame ops (no Python in the hot path) and all are
deterministic, so the DuckDB oracle hash-checks them exactly.

Scale notes (100 TB):
- pack_token_chunks partitions by source — each source packs independently,
  so the window sort is per-source, never a single global sort.
- interleave_sources derives the global round-robin position arithmetically
  from (per-source rank, source index) instead of a global row_number —
  a broadcast join against the tiny source-index dim, no global window.
- quantize_embeddings is a narrow per-row map (array fold + transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

CHUNK_TOKENS = 512  # token budget per packed training chunk


@query(
    "pack_token_chunks",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_before
      FROM d
    )
    SELECT source,
           CAST(cum_before // {CHUNK_TOKENS} AS BIGINT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY 1, 2
    """,
)
def pack_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in doc_id order, per source) to
    contiguous chunks of ~CHUNK_TOKENS whitespace tokens — the
    concat-and-split batching used to build fixed-length training examples.
    chunk_id = floor(tokens-before-this-doc / budget), i.e. a doc starts a
    new chunk once the running total crosses the budget.

    Partitioning by source keeps the running-sum window per-source (each
    source packs independently), so no global sort exists anywhere — the
    shape that survives a 100 TB corpus."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        c.withColumn(
            "chunk_id",
            F.floor(F.col("cum_before") / CHUNK_TOKENS).cast("bigint"),
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "interleave_sources",
    oracle="""
    WITH idx AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_src
      FROM (SELECT DISTINCT source FROM documents)
    ),
    r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1
               AS rn
      FROM documents
    )
    SELECT CAST(r.rn * idx.n_src + idx.src_idx AS BIGINT) AS pos,
           r.doc_id, r.source
    FROM r JOIN idx ON r.source = idx.source
    """,
)
def interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing: round-robin interleave of sources for a
    training epoch. pos = per-source-rank * n_sources + source-index, so
    consecutive positions cycle through the sources.

    The only global window runs over the DISTINCT source list (tiny —
    metadata-sized), then broadcast-joins back; the per-document rank is a
    per-source window. No global row_number over the corpus, which would
    serialize a 100 TB epoch onto one task."""
    docs = load(spark, sf_dir, "documents")
    idx = (
        docs.select("source")
        .distinct()
        .withColumn(
            "src_idx",
            F.row_number().over(Window.orderBy("source")) - 1,
        )
        .withColumn("n_src", F.count("*").over(Window.partitionBy()))
    )
    r = docs.select(
        "doc_id",
        "source",
        (
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")
            )
            - 1
        ).alias("rn"),
    )
    return r.join(F.broadcast(idx), "source").select(
        (F.col("rn") * F.col("n_src") + F.col("src_idx"))
        .cast("bigint")
        .alias("pos"),
        "doc_id",
        "source",
    )


@query(
    "quantize_embeddings",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
    ),
    m AS (
      SELECT vec_id, v, label,
             greatest(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(v, x -> abs(x))),
               (acc, x) -> greatest(acc, x)), 1e-30) AS maxabs
      FROM e
    )
    SELECT vec_id, label,
           ROUND(maxabs, 6) AS scale_maxabs,
           list_transform(v, x -> CAST(round((x * 127.0) / maxabs) AS INT))
             AS qvec
    FROM m
    """,
)
def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per embedding: q_i = round(127 * x_i /
    max|x|) — the storage/serving compression step after embedding
    generation. A narrow per-row map (fold for max|x|, transform for the
    quantized array): zero shuffle, trivially linear at any scale.

    The fold and the (x * 127.0) / maxabs operation order are written
    identically on both engines so the doubles — and therefore every
    rounded int8 — are bit-identical."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        "label",
    )
    m = e.withColumn(
        "maxabs",
        F.greatest(
            F.expr(
                "aggregate(transform(v, x -> abs(x)),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, x))"
            ),
            F.lit(1e-30),
        ),
    )
    return m.select(
        "vec_id",
        "label",
        F.round("maxabs", 6).alias("scale_maxabs"),
        F.expr(
            "transform(v, x -> CAST(round((x * 127.0) / maxabs) AS INT))"
        ).alias("qvec"),
    )
