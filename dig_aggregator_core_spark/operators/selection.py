"""Data-selection operators — the "which documents make the training set"
stage that sits between curation (operators/curation.py) and assembly
(operators/training.py): DSIR-style importance weighting against a target
domain, curriculum phase/ordering assignment, and global token-budget
allocation across sources (waterfilling).

All three are deterministic integer/rational pipelines (no log/exp links,
no rand()) so the DuckDB oracles hash-check exact values — the same
cross-engine-determinism discipline as operators/curation.py.

Scale notes (100 TB):
- dsir: the bucket-stats pass shuffles at most B=1024 (DSIR_BUCKETS) rows
  after map-side combine; the per-doc scoring pass is a pure codegen fold
  against a broadcast 1024-entry literal map — zero shuffle of text. The threshold
  aggregate re-scans the scored relation (quantile_bucketize precedent);
  at scale the threshold comes from the previous profile stage.
- curriculum: phase cuts are one metadata aggregate; ordering is
  row_number inside (phase, shard) partitions — never a global sort. A
  loader consumes shards independently, so the full corpus order is never
  materialized on one node.
- token budget: waterfilling runs entirely on the |sources|-row aggregate
  (unpartitioned window over metadata, per the quality_drift_by_source
  lineage lesson); doc selection is a per-source cumulative window. A
  skewed giant source serializes its cumsum — the documented 100 TB
  refinement is sub-source sharding with per-shard budgets
  (pack_bins_ffd's shard trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, maybe_spread

DSIR_BUCKETS = 1024  # hashed n-gram feature buckets
DSIR_SCALE = 1_000_000  # integer micro-units for the per-bucket ratio
CURRICULUM_SHARDS = 8  # loader-facing shards inside each phase
BUDGET_NUM, BUDGET_DEN = 2, 5  # token budget = 40% of corpus tokens

# unigrams + bigrams of the whitespace tokenization; the bigram branch
# guards size>=2 because sequence(a, b) DESCENDS when b < a (PLANS.md r5
# lesson) instead of returning empty. Bigrams via zip_with over two
# slices, NOT transform(sequence, i -> element_at(toks, i)...): the
# index-lambda form was 5.6x slower to explode downstream (measured
# sf0.1: pass-1 aggregate 2.64 s -> 0.77 s) — element_at with a lambda
# index defeats the cheap array iterator. Same strings, same order.
_NGRAMS_SPARK = (
    "concat(toks, IF(size(toks) >= 2,"
    " zip_with(slice(toks, 1, size(toks) - 1),"
    "          slice(toks, 2, size(toks) - 1),"
    "   (a, b) -> concat(a, ' ', b)),"
    " CAST(array() AS ARRAY<STRING>)))"
)
_NGRAMS_SQL = (
    "toks || CASE WHEN len(toks) >= 2 THEN"
    " list_transform(range(1, len(toks)),"
    "   i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])"
    " ELSE [] END"
)


def _bucket_spark(col: F.Column) -> F.Column:
    """h32(ngram) % B — first 8 md5 hex chars as bigint (the shared
    Spark/DuckDB uniform hash, curation._H32_SQL family)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        % DSIR_BUCKETS
    )


_BUCKET_SQL = (
    f"CAST(('0x' || substr(md5({{g}}), 1, 8)) AS BIGINT) % {DSIR_BUCKETS}"
)


@query(
    "dsir_importance_select",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    ng AS (
      SELECT doc_id, lang, unnest({_NGRAMS_SQL}) AS g FROM t
    ),
    stats AS (
      SELECT {_BUCKET_SQL.format(g='g')} AS b,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tb,
             COUNT(*) AS rb
      FROM ng GROUP BY 1
    ),
    sc AS (
      SELECT b, ((tb + 1) * {DSIR_SCALE}) // (rb + 1) AS s FROM stats
    ),
    doc_scores AS (
      SELECT d.doc_id,
             CAST(SUM(sc.s) // COUNT(*) AS BIGINT) AS score
      FROM (SELECT doc_id, {_BUCKET_SQL.format(g='g')} AS b FROM ng) d
      JOIN sc USING (b) GROUP BY 1
    ),
    thr AS (SELECT quantile_cont(score, 0.75) AS q FROM doc_scores)
    SELECT doc_id, score, score >= q AS selected
    FROM doc_scores, thr
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    score every document by hashed-n-gram importance against a target
    domain (here lang='en'), keep the top quartile.

    Deterministic integer variant: DSIR's per-feature log-likelihood
    ratio log(p_t[b]/p_r[b]) is replaced by the integer micro-share
    ((t_b+1)*1e6) DIV (r_b+1) (add-one smoothed P(target | bucket)), and
    a document's score is the per-n-gram MEAN of its bucket shares
    (integer DIV by the n-gram count — the normalization DSIR gets from
    using probability ratios; an unnormalized sum just measures document
    length, which the first draft of this op demonstrated empirically).
    Exact BIGINT arithmetic end-to-end so the cross-engine hash can't
    drift (the "scores avoid exp/log links" rule, PLANS.md). Real
    deployments sum log-ratios; the swap is one expression.

    Plan shape (the 100 TB design point): pass 1 aggregates n-gram
    buckets — after map-side combine at most B=1024 (DSIR_BUCKETS) rows
    reach the shuffle; the 1024-row ratio table is collected (metadata-sized, the
    documented k-centroids/bloom-positions class of collect) and embedded
    as a literal map, so pass 2 scores each document with ONE codegen
    array fold — zero shuffle, zero Python, no join. The selection
    threshold is one more tiny aggregate over the scored relation
    (scan-twice, quantile_bucketize precedent; at scale the threshold is
    a profile-stage input). Quarter percentiles of integer scores are
    binary-exact on both engines (division by 4)."""
    # md5-per-ngram is CPU-heavy narrow work; a one-file fixture scan
    # would serialize it on one core (PLANS.md checklist: "CPU-heavy
    # narrow maps after a small-file scan") — spread only when the scan
    # itself is under-partitioned (filesystem width probe)
    docs = maybe_spread(
        load(spark, sf_dir, "documents"), sf_dir, "documents", "doc_id"
    )
    docs = docs.select(
        "doc_id",
        "lang",
        F.split(F.col("text"), " ").alias("toks"),
    )
    ngrams = docs.select(
        "doc_id", "lang", F.expr(_NGRAMS_SPARK).alias("ngrams")
    )
    exploded = ngrams.select(
        "lang", F.explode("ngrams").alias("g")
    ).select(F.col("lang"), _bucket_spark(F.col("g")).alias("b"))
    stats = exploded.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tb"),
        F.count(F.lit(1)).alias("rb"),
    )
    # 1024-row collect: metadata-sized by construction (B=DSIR_BUCKETS)
    ratio_rows = [
        (int(r["b"]), int(((r["tb"] + 1) * DSIR_SCALE) // (r["rb"] + 1)))
        for r in stats.collect()
    ]
    # ONE parsed map expression, not 2*B F.lit py4j round trips: the 1024
    # create_map literals cost ~4 s of pure driver chatter (measured, the
    # privacy_dp_counts batch-1 lesson); the parsed literal is identical
    # in the plan (values are plain ints, no quoting concerns)
    ratio_map = F.expr(
        "map("
        + ", ".join(f"{b}L, {s}L" for b, s in ratio_rows)
        + ")"
    )
    # buckets never observed in pass 1 are unreachable from any document
    # (every doc n-gram was counted); the coalesce default is dead code
    # kept for fold-null safety
    score_sum = F.aggregate(
        F.col("ngrams"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.coalesce(
            F.element_at(ratio_map, _bucket_spark(x)),
            F.lit(DSIR_SCALE).cast("bigint"),
        ),
    )
    # integer mean via floor(double division): sum <= 1e6 * |ngrams| and
    # |ngrams| >= 1, so the quotient's distance from any integer it isn't
    # is >= 1/|ngrams| >> double ulp — floor is exact (matches DuckDB //)
    # scan-twice, deliberately unmaterialized: a localCheckpoint of
    # (doc_id, score) to dedupe the two consumers was A/B-measured 21%
    # SLOWER at sf0.1 (eager materialization + two extra jobs beat the
    # saved fold pass); at real scale the threshold comes from a profile
    # stage anyway (docstring), so the second pass never ships.
    scored = ngrams.select(
        "doc_id",
        F.floor(score_sum / F.size("ngrams")).cast("bigint").alias("score"),
    )
    thr = scored.agg(F.expr("percentile(score, 0.75)").alias("q"))
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "score",
        (F.col("score") >= F.col("q")).alias("selected"),
    )


@query(
    "curriculum_order",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             (n_chars * 1000) // len(string_split(text, ' ')) AS difficulty
      FROM documents
    ),
    cuts AS (
      SELECT quantile_cont(difficulty, 0.25) AS q1,
             quantile_cont(difficulty, 0.50) AS q2,
             quantile_cont(difficulty, 0.75) AS q3
      FROM d
    ),
    p AS (
      SELECT doc_id, difficulty,
             CAST(CASE WHEN difficulty <= q1 THEN 0
                       WHEN difficulty <= q2 THEN 1
                       WHEN difficulty <= q3 THEN 2
                       ELSE 3 END AS INT) AS phase,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {CURRICULUM_SHARDS} AS INT) AS shard
      FROM d, cuts
    )
    SELECT doc_id, CAST(difficulty AS BIGINT) AS difficulty, phase, shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY phase, shard
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos
    FROM p
    """,
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning order assignment (Bengio et al. 2009 family):
    bucket documents into 4 difficulty phases (quartiles of integer
    mean-word-length micro-score n_chars*1000 DIV n_tokens), then give
    each doc a deterministic position inside (phase, shard).

    The trap this op designs around: "curriculum order" naively means ONE
    global sort of the corpus. Instead the order is (phase, shard, pos) —
    phase cuts are one metadata-sized aggregate broadcast back (exact
    quartiles of integers are binary-exact cross-engine: /4), shard is
    md5-hash mod 8, and pos is row_number inside a (phase, shard)
    partitioned window. A training loader walks phases in order and reads
    shards in parallel, so no node ever materializes a corpus-wide
    ordering — the window's partition count scales with shards, not rows.
    Within-shard order is md5(doc_id), the reproducible shuffle the
    sampling family already uses (curation.py)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "(n_chars * 1000) DIV size(split(text, ' '))"
        ).alias("difficulty"),
    )
    cuts = d.agg(
        F.expr("percentile(difficulty, 0.25)").alias("q1"),
        F.expr("percentile(difficulty, 0.50)").alias("q2"),
        F.expr("percentile(difficulty, 0.75)").alias("q3"),
    )
    md5_key = F.md5(F.col("doc_id").cast("string"))
    p = d.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        F.col("difficulty").cast("bigint").alias("difficulty"),
        F.when(F.col("difficulty") <= F.col("q1"), 0)
        .when(F.col("difficulty") <= F.col("q2"), 1)
        .when(F.col("difficulty") <= F.col("q3"), 2)
        .otherwise(3)
        .cast("int")
        .alias("phase"),
        (
            F.conv(F.substring(md5_key, 1, 8), 16, 10).cast("bigint")
            % CURRICULUM_SHARDS
        )
        .cast("int")
        .alias("shard"),
    )
    w = Window.partitionBy("phase", "shard").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return p.select(
        "doc_id",
        "difficulty",
        "phase",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@query(
    "token_budget_allocation",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    s AS (SELECT source, SUM(n_tokens) AS total FROM d GROUP BY 1),
    g AS (
      SELECT source, total,
             SUM(total) OVER () AS grand,
             CAST(COUNT(*) OVER () AS BIGINT) AS k,
             COALESCE(SUM(total) OVER (
               ORDER BY total, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix,
             CAST(ROW_NUMBER() OVER (ORDER BY total, source) AS BIGINT)
               AS rn
      FROM s
    ),
    f AS (
      SELECT *, (grand * {BUDGET_NUM}) // {BUDGET_DEN} AS budget,
             CASE WHEN prefix + total * (k - rn + 1)
                       <= (grand * {BUDGET_NUM}) // {BUDGET_DEN}
                  THEN 1 ELSE 0 END AS funded
      FROM g
    ),
    a AS (
      SELECT *,
             COALESCE(SUM(CASE WHEN funded = 1 THEN total END) OVER (), 0)
               AS funded_sum,
             COALESCE(SUM(funded) OVER (), 0) AS funded_cnt
      FROM f
    ),
    alloc AS (
      SELECT source,
             CAST(CASE WHEN funded = 1 THEN total
                  ELSE (budget - funded_sum) // (k - funded_cnt)
                  END AS BIGINT) AS alloc
      FROM a
    ),
    sel AS (
      SELECT d.doc_id, d.source, d.n_tokens, alloc.alloc,
             COALESCE(SUM(d.n_tokens) OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix_tok
      FROM d JOIN alloc USING (source)
    )
    SELECT doc_id, source, n_tokens, alloc,
           (prefix_tok + n_tokens <= alloc) AS selected
    FROM sel
    """,
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token-budget allocation across sources (waterfilling) + the
    per-source document draw that realizes it: cap each source's token
    allocation at the waterfilling level so no source exceeds its fair
    share of a corpus-wide budget (40% of total tokens here), then select
    documents per source in md5 order until the allocation is spent.

    Waterfilling is closed-form after sorting sources ascending by token
    count (funded-ness is prefix-monotone under that order — proof in the
    repo's test): a source is fully funded iff prefix + total*(slots
    remaining) fits the budget; everyone else gets the integer level
    (budget - funded_sum) DIV (unfunded count). The whole computation
    runs as unpartitioned windows over the |sources|-row aggregate —
    metadata-sized, per the quality_drift_by_source lineage rule (never
    agg + crossJoin back through the corpus scan).

    Doc selection is one per-source window (exclusive running token sum
    in md5 order); a doc is selected iff it fits entirely. Integer
    arithmetic end-to-end — the oracle hash is exact. 100 TB note: a
    skewed giant source serializes its cumsum window; the refinement is
    sub-source sharding with per-shard budgets (pack_bins_ffd's shard
    bound), which this op's contract allows because md5 order is already
    arbitrary-but-reproducible."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    s = d.groupBy("source").agg(F.sum("n_tokens").alias("total"))
    w_all = Window.orderBy("total", "source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_pre = Window.orderBy("total", "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_rn = Window.orderBy("total", "source")
    g = s.select(
        "source",
        "total",
        F.sum("total").over(w_all).alias("grand"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("k"),
        F.coalesce(F.sum("total").over(w_pre), F.lit(0)).alias("prefix"),
        F.row_number().over(w_rn).cast("bigint").alias("rn"),
    )
    f_ = g.select(
        "*",
        F.expr(f"(grand * {BUDGET_NUM}) DIV {BUDGET_DEN}").alias("budget"),
        F.when(
            F.col("prefix") + F.col("total") * (F.col("k") - F.col("rn") + 1)
            <= F.expr(f"(grand * {BUDGET_NUM}) DIV {BUDGET_DEN}"),
            1,
        )
        .otherwise(0)
        .alias("funded"),
    )
    a = f_.select(
        "*",
        F.coalesce(
            F.sum(F.when(F.col("funded") == 1, F.col("total"))).over(w_all),
            F.lit(0),
        ).alias("funded_sum"),
        F.coalesce(F.sum("funded").over(w_all), F.lit(0)).alias(
            "funded_cnt"
        ),
    )
    alloc = a.select(
        "source",
        F.when(F.col("funded") == 1, F.col("total"))
        .otherwise(
            F.expr("(budget - funded_sum) DIV (k - funded_cnt)")
        )
        .cast("bigint")
        .alias("alloc"),
    )
    w_tok = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sel = d.join(F.broadcast(alloc), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "alloc",
        F.coalesce(F.sum("n_tokens").over(w_tok), F.lit(0)).alias(
            "prefix_tok"
        ),
    )
    return sel.select(
        "doc_id",
        "source",
        "n_tokens",
        "alloc",
        (F.col("prefix_tok") + F.col("n_tokens") <= F.col("alloc")).alias(
            "selected"
        ),
    )
