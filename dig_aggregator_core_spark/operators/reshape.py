"""Reshaping operators: pivot, explode (UDTF-style row generation), HAVING,
union-by-name with missing columns, and NULL-ordered sorts — the remaining
relational-surface gaps (SURVEY.md §2.3/§2.4/§2.6 GAP rows).

All native DataFrame ops. Pivot pins its column set explicitly (values=
given to avoid a discovery pass — at 100 TB the extra scan matters);
explode keeps ordinal position so the operation is invertible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, ntz_epoch_us


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p,
           ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
                 THEN CAST(ROUND(o_totalprice * 100) AS HUGEINT) END), 0)
                 AS DOUBLE) / 100, 4) AS total_o,
           ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(ROUND(o_totalprice * 100) AS HUGEINT) END), 0)
                 AS DOUBLE) / 100, 4) AS total_f,
           ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                 THEN CAST(ROUND(o_totalprice * 100) AS HUGEINT) END), 0)
                 AS DOUBLE) / 100, 4) AS total_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a pinned value set (no distinct-discovery scan): order
    status columns per priority, count + summed price per cell. Physically
    one hash aggregate — same shuffle as the unpivoted group-by."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact cents per pivot cell — bounded (priority x status)
            # grid whose magnitude grows with the corpus (lifted r9)
            F.expr(
                "ROUND(CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100)"
                " AS DECIMAL(38,0))), 0) AS DOUBLE) / 100, 4)"
            ).alias("total"),
        )
    )
    return piv.select(
        "priority",
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_p"),
        F.coalesce(F.col("O_total"), F.lit(0.0)).alias("total_o"),
        F.coalesce(F.col("F_total"), F.lit(0.0)).alias("total_f"),
        F.coalesce(F.col("P_total"), F.lit(0.0)).alias("total_p"),
    )


@query(
    "having_clause",
    oracle="""
    SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS total
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 8 AND SUM(o_totalprice) > 100000
    """,
)
def having_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — a post-aggregation filter; Catalyst keeps it
    above the partial/final aggregate, never re-scanning."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
        .filter((F.col("n_orders") >= 8) & (F.col("total") > 100000))
    )


@query(
    "explode_positional",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(1, len(toks) + 1)) - 1 AS INT) AS pos,
           unnest(toks) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    WHERE doc_id % 200 = 0
    """,
)
def explode_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — UDTF-style row generation keeping ordinal position (the
    generator runs inside codegen; no Python)."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 200 == 0)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    return d.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    )


@query(
    "union_missing_columns",
    oracle="""
    SELECT s_suppkey AS key, s_acctbal AS bal, NULL AS segment, 'supplier' AS side
    FROM supplier
    UNION ALL
    SELECT c_custkey AS key, NULL AS bal, c_mktsegment AS segment, 'customer' AS side
    FROM customer
    """,
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-merging union, absent
    columns null-filled — the DataFrame form of schema evolution across
    heterogeneous inputs."""
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").alias("bal"),
        F.lit("supplier").alias("side"),
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("side"),
    )
    return s.unionByName(c, allowMissingColumns=True).select(
        "key", "bal", "segment", "side"
    )


@query(
    "nulls_ordering",
    oracle="""
    SELECT o_orderkey AS orderkey, band
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE o_orderkey % 10 END AS band
      FROM orders
    )
    ORDER BY band DESC NULLS LAST, o_orderkey
    LIMIT 25
    """,
)
def nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in sorts (desc_nulls_last) + LIMIT — a
    total order, so the top-25 is deterministic cross-engine."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 10)
        .alias("band"),
    )
    return o.orderBy(F.col("band").desc_nulls_last(), "orderkey").limit(25)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): keeps duplicate cardinality —
    a row surviving k_left - k_right times — unlike the set-semantics
    `except` (U2). Spark plans both as aggregate+join on the value, no
    sort."""
    li = load(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("suppkey")
    )
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_suppkey").alias("suppkey")
    )
    return r.exceptAll(a)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): min(k_left, k_right) copies
    of each value survive."""
    li = load(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("suppkey")
    )
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_suppkey").alias("suppkey")
    )
    return r.intersectAll(a)


@query(
    "unpivot_melt",
    oracle="""
    SELECT s_suppkey AS suppkey, metric,
           ROUND(CAST(val AS DOUBLE), 4) AS val
    FROM (
      SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS val FROM supplier
      UNION ALL
      SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE)
      FROM supplier
    )
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long), the inverse of the pivot row: native
    `df.unpivot` — a generator expansion, no shuffle. The oracle expresses
    the same relation as the portable UNION ALL form."""
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_acctbal").cast("double").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return supp.unpivot(
        ids=["suppkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="v",
    ).select("suppkey", "metric", F.round("v", 4).alias("val"))


@query(
    "lateral_topn_per_group",
    oracle="""
    SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey,
           ROUND(CAST(t.o_totalprice AS DOUBLE), 4) AS totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def lateral_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer), run through
    Spark SQL's LATERAL support. Catalyst decorrelates it into the same
    window top-k plan as the DataFrame form — there is no per-row re-scan
    at execution, which is exactly why LATERAL is safe at scale."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey,
               ROUND(CAST(t.o_totalprice AS DOUBLE), 4) AS totalprice
        FROM v_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM v_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@query(
    "sample_train_val_test",
    oracle="""
    SELECT CASE
             WHEN h % 100 < 80 THEN 'train'
             WHEN h % 100 < 90 THEN 'val'
             ELSE 'test'
           END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT n_chars,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM documents
    )
    GROUP BY 1
    """,
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by key hash — the
    split is a pure function of doc_id, so it is stable across engines,
    re-runs, repartitions, and incremental appends (a new doc never moves
    an old doc between splits, unlike fraction-based randomSplit)."""
    docs = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    split = (
        F.when(h % 100 < 80, "train").when(h % 100 < 90, "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "sample_k_per_group",
    oracle="""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    WHERE rn <= 3
    """,
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling: exactly 3 docs per language,
    chosen by ranking on a key hash — an order-free, engine-portable
    stand-in for reservoir sampling (same guarantee: uniform-ish, fixed k,
    reproducible). Spark prunes with WindowGroupLimit before the shuffle,
    so each task forwards at most k rows per group — the eval-set builder
    that stays cheap at corpus scale."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "doc_id", "n_chars")
    )


_KFOLD_K = 5

_KFOLD_ORACLE = f"""
WITH assigned AS (
  SELECT user_id, event_id, value,
         CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {_KFOLD_K} AS INT) AS fold
  FROM events
)
SELECT fold,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_groups,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS HUGEINT))
                  AS DOUBLE) / 100, 4) AS sum_value
FROM assigned GROUP BY fold
"""


@query("sample_group_kfold", oracle=_KFOLD_ORACLE)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-atomic k-fold assignment ({k} folds): every row of a user
    lands in the SAME fold because the fold comes from md5(user_id), not
    from the row — the leakage guard cross-validation needs when rows
    within a group are correlated (sklearn's GroupKFold, as a pure
    column expression). Deterministic and append-stable: new events of a
    known user join their existing fold, exactly like
    sample_train_val_test's key-hash split.

    Plan: fold assignment is map-side; the only shuffle is the k-row
    fold-stats aggregate (plus the distinct-user count's Expand — drop
    n_groups for a pure one-exchange profile). Train/eval selection at
    scale is then a partition-pruned filter on the fold column."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % _KFOLD_K
    ).cast("int")
    return (
        ev.withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.count_distinct("user_id").alias("n_groups"),
            F.count(F.lit(1)).alias("n_rows"),
            # exact cents on the k-fold key (events.value is 2dp;
            # lifted r9)
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(value * 100) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 100, 4)"
            ).alias("sum_value"),
        )
    )


sample_group_kfold.__doc__ = sample_group_kfold.__doc__.format(k=_KFOLD_K)


@query(
    "sample_class_balance",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ),
    m AS (SELECT MIN(c) AS min_n FROM
            (SELECT COUNT(*) AS c FROM documents GROUP BY lang))
    SELECT doc_id, lang, n_chars
    FROM r, m WHERE r.rk <= m.min_n
    """,
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language keeps exactly
    min-class-size documents (chosen by md5 order — reproducible,
    append-stable), the standard rebalancing step before training a
    classifier on skewed labels. The majority class shrinks to the
    minority's size; nothing is oversampled, so no row duplication.

    Plan: one ranking window per class (WindowGroupLimit prunes beyond
    the cap map-side once the 1-row min-count frame broadcasts), one
    metadata aggregate for the minimum class size. Deterministic: the
    kept set is a pure function of doc_id, like every sampler in this
    module."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    r = docs.select(
        "doc_id", "lang", "n_chars", F.row_number().over(w).alias("rk")
    )
    m = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").alias("min_n"))
    )
    return (
        r.crossJoin(F.broadcast(m))
        .filter(F.col("rk") <= F.col("min_n"))
        .select("doc_id", "lang", "n_chars")
    )


# temporal split boundaries: train < TRAIN_END <= embargo < TEST_START
# <= test. Fixed CALENDAR cutoffs (the production form: a release is cut
# at a date, not at a data-derived percentile) — the fixture events span
# 2024-01-01 .. 2024-01-30 at every SF, so all three splits are non-empty.
_TSPLIT_TRAIN_END = "2024-01-22 00:00:00"
_TSPLIT_TEST_START = "2024-01-23 00:00:00"


@query(
    "sample_temporal_split",
    oracle=f"""
    SELECT CASE WHEN ts < TIMESTAMP '{_TSPLIT_TRAIN_END}' THEN 'train'
                WHEN ts < TIMESTAMP '{_TSPLIT_TEST_START}' THEN 'embargo'
                ELSE 'test' END AS split,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ep_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ep_us
    FROM events
    GROUP BY 1, 2
    """,
)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with an embargo gap — the
    leakage-avoiding split for time-dependent data, completing the
    sampling family's split trio (hash split = i.i.d. assumption,
    group-kfold = entity leakage, temporal = time leakage): rows in the
    24 h embargo band between train end and test start are ASSIGNED TO
    NEITHER side, so features with up-to-a-day lookback (rolling windows,
    session aggregates) computed on train rows can never observe test
    rows. Boundaries are fixed calendar literals — the production form
    (a data-derived percentile cutoff would re-split every time data
    arrives, silently moving rows between train and test across runs).

    Plan: the split label is a pure row expression, so the whole op is
    ONE partial-aggregated groupBy on (split, event_type); min/max report
    exact epoch microseconds (tz-proof NTZ arithmetic) so the oracle
    also pins that no row leaked across a boundary."""
    ev = load(spark, sf_dir, "events")
    # NTZ literals: a to_timestamp() literal would be an instant and the
    # NTZ-vs-instant comparison shifts by the session timezone (the
    # tests/test_timezone_proof.py contract)
    split = (
        F.when(
            F.col("ts") < F.expr(f"TIMESTAMP_NTZ '{_TSPLIT_TRAIN_END}'"),
            F.lit("train"),
        )
        .when(
            F.col("ts") < F.expr(f"TIMESTAMP_NTZ '{_TSPLIT_TEST_START}'"),
            F.lit("embargo"),
        )
        .otherwise(F.lit("test"))
        .alias("split")
    )
    return ev.groupBy(split, "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.min(ntz_epoch_us("ts")).cast("bigint").alias("min_ep_us"),
        F.max(ntz_epoch_us("ts")).cast("bigint").alias("max_ep_us"),
    )
