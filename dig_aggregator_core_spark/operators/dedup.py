"""Deduplication operators over the documents table (filled in this round)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest, keep lowest doc_id.
    Hashing the digest (not the full text) keeps the shuffle narrow at scale.
    """
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("h")
    )
