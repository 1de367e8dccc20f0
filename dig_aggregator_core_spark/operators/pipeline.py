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
from ..tables import load, ntz_epoch_us


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


_FEATURES_ORACLE = """
WITH stats AS (
  SELECT event_type, MEDIAN(value) AS med FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, MEDIAN(ABS(e.value - s.med)) AS mad
  FROM events e JOIN stats s USING (event_type) GROUP BY e.event_type
),
enriched AS (
  SELECT e.user_id, e.ts, CAST(e.value AS DOUBLE) AS v,
         CASE WHEN ABS(e.value - s.med) > 3.5 * 1.4826 * m.mad
              THEN 1 ELSE 0 END AS is_outlier
  FROM events e
  JOIN stats s USING (event_type) JOIN mad m USING (event_type)
),
flagged AS (
  SELECT user_id, v, is_outlier,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                       PARTITION BY user_id ORDER BY ts)
                   <= 30 * 60 * 1000000
              THEN 0 ELSE 1 END AS new_session,
         ts
  FROM enriched
),
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(SUM(v), 4) AS total_value,
         CAST(SUM(new_session) AS BIGINT) AS n_sessions,
         CAST(SUM(is_outlier) AS BIGINT) AS n_outliers,
         list(v ORDER BY ts, v) AS vals
  FROM flagged GROUP BY user_id
)
SELECT user_id, n_events, total_value, n_sessions, n_outliers,
       ROUND(list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
FROM per_user
"""


@query("pipeline_user_features", oracle=_FEATURES_ORACLE)
def pipeline_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed per-entity feature-engineering pipeline — the event-side
    sibling of ``pipeline_corpus_curation``: robust-outlier flagging
    (median/MAD per event_type), sessionization (30-min gap), and the
    EWMA smoothed-activity feature, emitted as one feature row per user
    in ONE declarative plan.

    The plan shape is the point: the tiny per-event_type stats aggregate
    twice and broadcast back onto the event scan (map-side enrich); the
    session lag-window and the final groupBy share the SAME user_id
    partitioning, so the whole per-user stage is one shuffle. Catalyst
    sees the entire chain — no materialization barriers between the
    "operators" being composed. At 100 TB: stats are group-count-sized,
    events shuffle exactly once.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", F.col("value").cast("double").alias("v")
    )
    stats = ev.groupBy("event_type").agg(F.expr("median(v)").alias("med"))
    mad = (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(F.expr("median(abs(v - med))").alias("mad"))
    )
    enriched = (
        ev.join(F.broadcast(stats), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "user_id",
            "ts",
            "v",
            F.when(
                F.abs(F.col("v") - F.col("med"))
                > 3.5 * 1.4826 * F.col("mad"),
                1,
            )
            .otherwise(0)
            .alias("is_outlier"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    us = ntz_epoch_us("ts")  # tz-proof naive-epoch micros (tables.py)
    gap = us - F.lag(us).over(w)
    flagged = enriched.withColumn(
        "new_session",
        F.when(gap <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(F.lit(1)),
    )
    per_user = flagged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("v"), 4).alias("total_value"),
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.sum("is_outlier").cast("bigint").alias("n_outliers"),
        F.array_sort(F.collect_list(F.struct("ts", "v"))).alias("pairs"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        "total_value",
        "n_sessions",
        "n_outliers",
        F.round(
            F.expr(
                "aggregate(slice(pairs, 2, size(pairs) - 1), "
                "element_at(pairs, 1).v, "
                "(acc, p) -> 0.3D * p.v + 0.7D * acc)"
            ),
            6,
        ).alias("ewma"),
    )


_RAG_W, _RAG_S = 200, 150  # chunk window/stride (shared with curation)

_RAG_ORACLE = f"""
WITH kept AS (
  SELECT doc_id, text, source,
         -1.2 + 2.0 * (CAST(len(list_distinct(string_split(text, ' ')))
                       AS DOUBLE) / len(string_split(text, ' ')))
             + 0.8 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0)
           AS logit
  FROM documents
  WHERE length(text) > 0
), scored AS (
  SELECT * FROM kept WHERE 1.0 / (1.0 + exp(-logit)) >= 0.4
), chunks AS (
  SELECT doc_id, source,
         CAST(i - 1 AS INT) AS chunk_idx,
         substr(text, (i - 1) * {_RAG_S} + 1, {_RAG_W}) AS chunk
  FROM scored, LATERAL unnest(generate_series(
    1, 1 + CAST(floor((greatest(length(text) - {_RAG_W}, 0)
                       + {_RAG_S} - 1) / {_RAG_S}) AS INT))) AS t(i)
), deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks
  ) WHERE rn = 1
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(length(chunk)) AS BIGINT) AS total_chars,
       md5(string_agg(md5(chunk), ',' ORDER BY md5(chunk)))
         AS corpus_digest
FROM deduped GROUP BY source
"""


@query("pipeline_rag_chunking", oracle=_RAG_ORACLE)
def pipeline_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG ingest pipeline as ONE plan (fourth flagship): linear
    quality gate -> overlapping chunking -> exact chunk-level dedup ->
    per-source report with an order-insensitive corpus digest. Composes
    this round's operators (quality_classifier_score's probe,
    doc_chunk_overlap's splitter, dedup_exact's digest-group) without a
    materialization barrier: Catalyst sees the whole chain, so the
    quality filter prunes BEFORE the chunk explode (cheap gate ahead of
    the 2x data amplification — same stage-ordering rule as
    pipeline_corpus_curation) and the only wide stages are the chunk-
    digest dedup and the report.

    The digest pins exact chunk membership per source, so the oracle
    catches a pipeline that filters, splits, or dedups differently —
    not just one with different counts."""
    toks = F.split(F.col("text"), " ")
    logit = (
        F.lit(-1.2)
        + 2.0 * (F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
        + 0.8 * F.least(F.size(toks) / 100.0, F.lit(1.0))
    )
    scored = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .withColumn("logit", logit)
        .filter(1.0 / (1.0 + F.exp(-F.col("logit"))) >= 0.4)
    )
    n_chunks = (
        1
        + F.floor(
            (F.greatest(F.length("text") - _RAG_W, F.lit(0)) + _RAG_S - 1)
            / _RAG_S
        )
    ).cast("int")
    chunks = scored.withColumn("nc", n_chunks).select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, nc),"
                f" i -> substring(text, (i - 1) * {_RAG_S} + 1, {_RAG_W}))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "chunk_idx")
    deduped = (
        chunks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum(F.length("chunk")).alias("total_chars"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list(F.md5("chunk"))), ",")
        ).alias("corpus_digest"),
    )
