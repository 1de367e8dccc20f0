"""Relevance search over the documents table: BM25 scoring with a global
top-k — the retrieval primitive behind corpus search, RAG candidate
generation, and query-based curation (pull the N most on-topic documents
for a probe query).

Shape notes (the 100 TB plan):

- The query's term set is a handful of literals, so per-document term
  frequencies are native array expressions over the tokenized text — no
  document explode, no inverted-index shuffle for scoring.
- The corpus statistics BM25 needs (N, avgdl, per-term df) reduce to ONE
  tiny row (a single partial-aggregate exchange), which joins back by
  broadcast — never a shuffle of the corpus.
- The global top-k is ``ORDER BY score LIMIT k``: Catalyst plans
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
  not a full sort.

Lucene's BM25 variant (idf = ln(1 + (N - df + .5)/(df + .5))) keeps idf
positive even for terms in most documents, which matters on saturated
vocabularies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_QUERY_TERMS = ("vector", "hash", "stream")
_K1, _B, _TOPK = 1.2, 0.75, 20

_TF_SQL = {
    t: f"CAST(len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS DOUBLE)"
    for t in _QUERY_TERMS
}

_BM25_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
         {', '.join(f'{sql} AS tf_{t}' for t, sql in _TF_SQL.items())}
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
         {', '.join(f'CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{t}' for t in _QUERY_TERMS)}
  FROM d
)
SELECT doc_id,
       ROUND({' + '.join(
         f"ln(1 + (n - df_{t} + 0.5) / (df_{t} + 0.5))"
         f" * tf_{t} * ({_K1} + 1)"
         f" / (tf_{t} + {_K1} * (1 - {_B} + {_B} * dl / avgdl))"
         for t in _QUERY_TERMS)}, 6) AS bm25
FROM d, stats
ORDER BY bm25 DESC, doc_id
LIMIT {_TOPK}
"""


def _eq_term(term: str):
    # one-arg closure: a default-arg lambda would have arity 2, which
    # F.filter reads as (element, index) and binds the INDEX to the term
    return lambda x: x == term


@query("bm25_topk", oracle=_BM25_ORACLE)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents by BM25 relevance to a fixed probe query
    ({terms}). k1={k1}, b={b}; ties broken by doc_id so the cut is
    deterministic on any engine and partitioning.

    One corpus scan computes (dl, per-term tf); a single-row reduction
    yields (N, avgdl, per-term df); the scoring pass joins that row back
    by broadcast and feeds TakeOrderedAndProject — two scans of the
    (pruned, two-column) input, one scalar exchange, heap-based top-k.
    """
    toks = F.split(F.col("text"), " ")
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        *[
            F.size(F.filter(toks, _eq_term(t)))
            .cast("double")
            .alias(f"tf_{t}")
            for t in _QUERY_TERMS
        ],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int"))
            .cast("double")
            .alias(f"df_{t}")
            for t in _QUERY_TERMS
        ],
    )
    score = None
    for t in _QUERY_TERMS:
        idf = F.log(
            1
            + (F.col("n") - F.col(f"df_{t}") + 0.5)
            / (F.col(f"df_{t}") + 0.5)
        )
        part = (
            idf
            * F.col(f"tf_{t}")
            * (_K1 + 1)
            / (
                F.col(f"tf_{t}")
                + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    return (
        d.join(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_TOPK)
    )


bm25_topk.__doc__ = bm25_topk.__doc__.format(
    terms=", ".join(_QUERY_TERMS), k1=_K1, b=_B
)
