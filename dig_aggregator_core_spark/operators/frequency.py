"""Flagship analytics pipeline: the frequency-analysis payload re-expressed
as pure DataFrame ops.

Reference: src/main/resources/pipeline/frequencyanalysis/frequencyAnalysis.py
(the one payload script the reference ships). Its shape: filter one ancestry
(line 13), drop NULL/NaN measures (lines 20-21), per-dataset max sample count
(lines 31-35), per (variant, dataset) means (lines 38-51), then a weighted
average across datasets hand-rolled with ``rdd.aggregateByKey`` (lines 54-75),
finally a left-outer join of the two measures (line 78).

The RDD drop-out at lines 55-75 kills whole-stage codegen and pickles every
row through Python; here the identical semantics are one hash aggregate:
``sum(x*n)/sum(n)`` — Catalyst keeps it in Tungsten with partial (map-side)
aggregation, and the tiny per-dataset weight table broadcast-joins.

Fixture binding (FIXTURES.md §8): variants := lineitem with
var_id=l_orderkey, dataset=l_suppkey, ancestry=l_returnflag, eaf=l_discount,
maf=l_extendedprice; metadata := supplier with n=s_acctbal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def _variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("var_id"),
        F.col("l_suppkey").alias("dataset"),
        F.col("l_linenumber").alias("trait"),
        F.col("l_returnflag").alias("ancestry"),
        F.col("l_discount").alias("eaf"),
        F.col("l_extendedprice").alias("maf"),
    )


def _weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # metadata dimension: one weight per dataset. The reference takes
    # max(samples) over per-trait metadata rows (frequencyAnalysis.py:31-35).
    return (
        load(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("dataset"), F.col("s_acctbal").alias("w"))
        .groupBy("dataset")
        .agg(F.max("w").alias("n"))
    )


def calc_freq(
    variants: DataFrame, weights: DataFrame, ancestry: str
) -> DataFrame:
    """One ancestry slice of the flagship pipeline (frequencyAnalysis.py:12-86).

    The reference (and this engine through round 2) runs one pipeline per
    measure — two lineitem scans, two avg shuffles, two weighted shuffles,
    and a final left-outer join. Both pipelines filter the same rows and
    group on the same keys, so they fuse into ONE scan with conditional
    aggregates: avg(CASE WHEN valid THEN x END) yields NULL for a group
    with no valid rows — exactly "the group is absent from that measure's
    pipeline" — and the weighted stage divides by sum(n) over only the
    datasets where that measure is present. Halves the scans, halves the
    shuffled bytes, and deletes the join; the left-outer semantics
    (MAF is the base, EAF optional) survive as a final maf-not-null filter.
    """
    df = variants.filter(F.col("ancestry") == F.lit(ancestry))

    # NULL + NaN predicate (frequencyAnalysis.py:20-21): SQL NULL and float
    # NaN are distinct in both engines; drop both. Rows valid for NEITHER
    # measure contribute to neither pipeline — drop before the shuffle.
    eaf_ok = F.col("eaf").isNotNull() & ~F.isnan("eaf")
    maf_ok = F.col("maf").isNotNull() & ~F.isnan("maf")
    df = df.filter(eaf_ok | maf_ok)

    # per (variant, dataset) means across traits (frequencyAnalysis.py:38-51),
    # both measures in one aggregate
    avg = df.groupBy("var_id", "dataset").agg(
        F.avg(F.when(eaf_ok, F.col("eaf"))).alias("eaf"),
        F.avg(F.when(maf_ok, F.col("maf"))).alias("maf"),
    )

    # weighted mean across datasets: the aggregateByKey rewrite
    # (frequencyAnalysis.py:54-75). `weights` is tiny -> broadcast hash join,
    # no shuffle of the fact side beyond the groupBy exchange. Each measure's
    # denominator counts only the datasets where that measure is present.
    w = avg.join(F.broadcast(weights), "dataset")
    out = w.groupBy("var_id").agg(
        (
            F.sum(F.col("eaf") * F.col("n"))
            / F.sum(F.when(F.col("eaf").isNotNull(), F.col("n")))
        ).alias("eaf"),
        (
            F.sum(F.col("maf") * F.col("n"))
            / F.sum(F.when(F.col("maf").isNotNull(), F.col("n")))
        ).alias("maf"),
    )

    # MAF always present, EAF optional (frequencyAnalysis.py:78): the
    # left-outer join's base-side filter. A NULL var_id never matches the
    # join condition in the two-pipeline form, so its EAF is NULL there too.
    return out.filter(F.col("maf").isNotNull()).select(
        "var_id",
        (
            F.round(F.when(F.col("var_id").isNotNull(), F.col("eaf")), 6)
            + 0.0
        ).alias("eaf"),
        F.round("maf", 6).alias("maf"),
        F.lit(ancestry).alias("ancestry"),
    )


_FLAGSHIP_ORACLE = """
WITH variants AS (
  SELECT l_orderkey AS var_id, l_suppkey AS dataset,
         l_returnflag AS ancestry, l_discount AS eaf, l_extendedprice AS maf
  FROM lineitem
  WHERE l_returnflag = 'R'
), weights AS (
  SELECT s_suppkey AS dataset, MAX(s_acctbal) AS n
  FROM supplier GROUP BY s_suppkey
), eaf_avg AS (
  SELECT var_id, dataset, AVG(eaf) AS eaf FROM variants
  WHERE eaf IS NOT NULL AND NOT isnan(eaf)
  GROUP BY var_id, dataset
), maf_avg AS (
  SELECT var_id, dataset, AVG(maf) AS maf FROM variants
  WHERE maf IS NOT NULL AND NOT isnan(maf)
  GROUP BY var_id, dataset
), eaf_w AS (
  SELECT var_id, SUM(eaf * n) / SUM(n) AS eaf
  FROM eaf_avg JOIN weights USING (dataset) GROUP BY var_id
), maf_w AS (
  SELECT var_id, SUM(maf * n) / SUM(n) AS maf
  FROM maf_avg JOIN weights USING (dataset) GROUP BY var_id
)
SELECT m.var_id AS var_id, ROUND(e.eaf, 6) + 0.0 AS eaf, ROUND(m.maf, 6) AS maf,
       'R' AS ancestry
FROM maf_w m LEFT OUTER JOIN eaf_w e ON m.var_id = e.var_id
"""


@query("flagship_frequency", oracle=_FLAGSHIP_ORACLE)
def flagship_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return calc_freq(_variants(spark, sf_dir), _weights(spark, sf_dir), "R")


# --- the component operators, registered individually (SURVEY.md §2.4) ---


@query(
    "agg_max_per_group",
    oracle="""
    SELECT s_nationkey AS nationkey, MAX(s_acctbal) AS max_acctbal,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM supplier GROUP BY s_nationkey
    """,
)
def agg_max_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: groupBy().max() — reference frequencyAnalysis.py:31-35."""
    return (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.max("s_acctbal").alias("max_acctbal"),
            F.count("*").alias("n_suppliers"),
        )
    )


@query(
    "agg_avg_two_key",
    oracle="""
    SELECT l_orderkey AS orderkey, l_suppkey AS suppkey,
           ROUND(AVG(l_discount), 6) + 0.0 AS avg_discount
    FROM lineitem GROUP BY l_orderkey, l_suppkey
    """,
)
def agg_avg_two_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: two-key groupBy().avg() — reference frequencyAnalysis.py:38-51."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg((F.round(F.avg("l_discount"), 6) + 0.0).alias("avg_discount"))
    )


@query(
    "weighted_avg",
    oracle="""
    SELECT l_returnflag AS returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
             AS w_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the aggregateByKey weighted average (frequencyAnalysis.py:54-75)
    as one DataFrame aggregate — partial aggregation map-side, full codegen."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity"),
                4,
            ).alias("w_avg_price")
        )
    )


@query(
    "filter_null_nan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_valid,
           ROUND(CAST(SUM(CAST(ROUND(eaf * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 6) AS sum_eaf
    FROM (
      SELECT CASE WHEN l_linenumber % 7 = 0 THEN NULL
                  WHEN l_linenumber % 5 = 0 THEN CAST('NaN' AS DOUBLE)
                  ELSE l_discount END AS eaf
      FROM lineitem
    ) WHERE eaf IS NOT NULL AND NOT isnan(eaf)
    """,
)
def filter_null_nan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: NULL vs NaN double semantics (frequencyAnalysis.py:20-21).
    Testdata has no NULL/NaN doubles, so inject both deterministically."""
    li = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_linenumber") % 7 == 0, F.lit(None).cast("double"))
        .when(F.col("l_linenumber") % 5 == 0, F.lit(float("nan")))
        .otherwise(F.col("l_discount"))
        .alias("eaf")
    )
    return li.filter(F.col("eaf").isNotNull() & ~F.isnan("eaf")).agg(
        F.count("*").alias("n_valid"),
        # eaf here is l_discount (exactly 2dp): exact cents, single
        # global group (lifted r9)
        F.expr(
            "ROUND(CAST(SUM(CAST(ROUND(eaf * 100) AS DECIMAL(38,0)))"
            " AS DOUBLE) / 100, 6)"
        ).alias("sum_eaf"),
    )


@query(
    "project_rename_literal",
    oracle="""
    SELECT s_suppkey AS dataset, s_acctbal AS n, 'EU' AS ancestry
    FROM supplier
    """,
)
def project_rename_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P4: projection with rename + literal column append
    (frequencyAnalysis.py:25-28, :85)."""
    return load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("dataset"),
        F.col("s_acctbal").alias("n"),
        F.lit("EU").alias("ancestry"),
    )
