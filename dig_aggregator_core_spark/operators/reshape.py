"""Reshaping operators: pivot, explode (UDTF-style row generation), HAVING,
union-by-name with missing columns, and NULL-ordered sorts — the remaining
relational-surface gaps (SURVEY.md §2.3/§2.4/§2.6 GAP rows).

All native DataFrame ops. Pivot pins its column set explicitly (values=
given to avoid a discovery pass — at 100 TB the extra scan matters);
explode keeps ordinal position so the operation is invertible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
                                   THEN o_totalprice END), 0), 4) AS total_o,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                                   THEN o_totalprice END), 0), 4) AS total_f,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                                   THEN o_totalprice END), 0), 4) AS total_p
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
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias(
                "total"
            ),
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
