"""A composed end-to-end corpus-curation pipeline — the operators of the
training-data family (quality scoring, language filter, exact dedup,
deterministic sampling) chained the way a production run chains them, as
ONE declarative plan. This is the second flagship (next to
``frequency.flagship_frequency``): it proves the operator library composes
without materialization barriers — Catalyst sees the whole chain, so
column pruning reaches the scan and the dedup shuffle is the only wide
stage.

Stage order matters at 100 TB and is chosen deliberately: cheap map-side
filters (quality, language) run FIRST to shrink the corpus before the
dedup shuffle; the hash-sample runs AFTER dedup so sampling rates apply to
unique documents, not to dup-inflated counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "pipeline_corpus_curation",
    oracle="""
    WITH scored AS (
      SELECT doc_id, text, lang, source, n_chars,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               AS n_uniq
      FROM documents
    ), filtered AS (
      SELECT * FROM scored
      WHERE n_tokens >= 20 AND n_uniq / n_tokens >= 0.2 AND lang = 'en'
    ), deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM filtered
      ) WHERE rn = 1
    ), sampled AS (
      SELECT * FROM deduped
      WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 10 < 5
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_uniq / n_tokens), 6) AS avg_ttr
    FROM sampled
    GROUP BY source
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality filter → language filter → exact dedup (keep lowest doc_id
    per content digest) → deterministic 50% hash sample → per-source
    report. One plan: the two filters are map-side and reach the scan
    before the single dedup shuffle (on the md5 digest, not the text);
    the sample is a map-side filter again. Mirrors
    textops.text_quality_score / dedup.dedup_exact /
    relational.sample_hash_systematic as a composition."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        F.size(toks).cast("double").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("double").alias("n_uniq"),
    )
    filtered = scored.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("n_uniq") / F.col("n_tokens") >= 0.2)
        & (F.col("lang") == "en")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    sampled = deduped.filter(h32 % 10 < 5)
    return sampled.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg(F.col("n_uniq") / F.col("n_tokens")), 6).alias(
            "avg_ttr"
        ),
    )
