"""Remaining TPC-H-shaped plan classes, adapted to the reduced fixture
schema (no partsupp / comment / phone / commitdate columns — TESTDATA.md).
Together with ``analytic.py`` this covers every distinct TPC-H plan shape:
scan-only aggregation (q6), EXISTS/NOT-EXISTS semi- and anti-joins with
non-equi correlation (q4, q21, q22), correlated scalar subqueries against
an aggregate of the same fact (q2, q11, q15, q17), outer-join distribution
(q13), NOT IN (q16), market-share conditional aggregation over an 8-way
join (q8, q9), and HAVING-gated IN (q18).

Scale notes (100 TB posture): every dimension side is filtered before the
join and broadcast when it stays small; fact-fact correlations
(q17/q21/q18) reuse the fact's own aggregate, which shuffles once on the
correlation key and joins co-partitioned. Where the reference's payload
would hand-roll these as RDD code (frequencyAnalysis.py:55-75 pattern),
each stays a single declarative plan so Catalyst/AQE pick broadcast vs
shuffle at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000)
                 // CAST(l_quantity AS BIGINT)) AS unit_cost_micro
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2
    )
    SELECT p_partkey AS partkey, s_name AS supplier,
           CAST(unit_cost_micro AS BIGINT) AS unit_cost_micro
    FROM part JOIN cost ON p_partkey = partkey
              JOIN supplier ON suppkey = s_suppkey
    WHERE p_size < 20 AND p_type = 'ECONOMY'
      AND unit_cost_micro = (SELECT MIN(c2.unit_cost_micro) FROM cost c2
                             WHERE c2.partkey = p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp-less): cheapest EUROPE supplier per part,
    where observed unit cost (extendedprice/quantity from lineitem) stands
    in for ps_supplycost. The correlated MIN subquery becomes a window MIN
    over the cost relation — one shuffle on partkey, no self-join.

    Exactness: unit cost is INTEGER MICRO-UNITS — cents x 10000
    truncating-DIV quantity, nonnegative so Spark DIV == DuckDB // (the
    signed-DIV ban doesn't bite). The earlier double division + ROUND(,4)
    hit the round-on-double tie trap at sf0.1 (111.10075 rounded .1007 vs
    .1008 across engines); MIN/equality over exact integers cannot
    drift. l_quantity is integral by construction, so the BIGINT cast is
    engine-agnostic."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load(spark, sf_dir, "lineitem")
    cost = (
        li.join(
            F.broadcast(supp.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.expr(
                "MIN((CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                " * 10000) DIV CAST(l_quantity AS BIGINT))"
            ).alias("unit_cost_micro")
        )
    )
    w = Window.partitionBy("partkey")
    best = cost.withColumn(
        "min_cost", F.min("unit_cost_micro").over(w)
    ).filter(F.col("unit_cost_micro") == F.col("min_cost"))
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") < 20) & (F.col("p_type") == "ECONOMY")
    )
    snames = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(part), best.partkey == part.p_partkey)
        .join(F.broadcast(snames), best.suppkey == F.col("s_suppkey"))
        .select(
            "partkey",
            F.col("s_name").alias("supplier"),
            F.col("unit_cost_micro").cast("bigint").alias("unit_cost_micro"),
        )
    )


@query(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY 1
    """,
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS over the fact (shipped >30 days
    after ordering, standing in for commitdate < receiptdate) → left-semi
    join with a non-equi residual on top of the equi key, then a tiny
    group-by on priority."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                          * CAST(ROUND(l_discount * 100) AS HUGEINT))
                      AS DOUBLE) / 1e4, 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side aggregation. All three predicates
    reach the parquet scan (PushedFilters) and only 3 of 11 columns are
    read (ReadSchema) — the canonical pushdown/pruning proof."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # exact 1e-4 units, single global group (lifted r9;
            # bigint per-row product, decimal only at the SUM)
            F.expr(
                "ROUND(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS"
                " BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)"
                " AS DECIMAL(38,0))) AS DOUBLE) / 1e4, 4)"
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                               ELSE 0 END) / SUM(volume) AS DOUBLE), 6)
             AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-relation join (nation twice) feeding a
    conditional-aggregation market share. Every dimension chain collapses
    to broadcasts; the only shuffled relations are the two facts."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(n1.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("nation"),
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nationkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    vol = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "nation")), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey")), orders.o_custkey == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0)
                )
                / F.sum("volume")
            ).cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year,
           ROUND(CAST(SUM(amount_1e4) AS DOUBLE) / 1e4, 4) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
               * CAST(ROUND((1 - l_discount) * 100) AS HUGEINT) AS amount_1e4
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supplycost-less): revenue by supplier nation × order
    year for parts whose name contains a color token. The LIKE filter
    can't push to parquet stats but does prune before the join."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "n_name")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            # exact 1e-4 units on the bounded (nation, year) key
            # (lifted r9; bigint per-row product, decimal at SUM)
            F.expr(
                "ROUND(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS"
                " BIGINT) * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)"
                " AS DECIMAL(38,0))) AS DOUBLE) / 1e4, 4)"
            ).alias("sum_profit")
        )
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH value_by_part AS (
      SELECT l_partkey AS partkey, SUM(l_extendedprice) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT partkey, ROUND(CAST(val AS DOUBLE), 4) AS part_value
    FROM value_by_part
    WHERE val > (SELECT SUM(val) * 0.01 FROM value_by_part)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-less): per-part traded value from one
    nation's suppliers, kept when above a fraction of the global total —
    an uncorrelated scalar subquery over the same aggregate. The aggregate
    is computed once and reused (no second scan of lineitem)."""
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load(spark, sf_dir, "lineitem")
    value_by_part = (
        li.join(F.broadcast(supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("l_extendedprice").alias("val"))
    )
    total = value_by_part.agg((F.sum("val") * 0.01).alias("threshold"))
    return (
        value_by_part.join(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select(
            "partkey", F.round(F.col("val").cast("double"), 4).alias("part_value")
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a filter ON THE JOIN CONDITION
    (not a post-filter — unmatched customers must survive with count 0),
    then a distribution-of-counts double aggregation."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey AS suppkey, s_name AS name,
           ROUND(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue "view" is computed once; the MAX scalar
    subquery against it broadcasts back as a 1-row join — not a re-scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.round(F.col("total_revenue").cast("double"), 4).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand AS brand, p_type AS type, p_size AS size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 11, 17, 23, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp-less): distinct-supplier counts per part
    descriptor with a NOT IN exclusion list. NOT IN compiles to a
    left-anti join (the exclusion side has no NULL keys, so anti-join and
    NOT IN agree)."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(5, 11, 17, 23, 29))
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT))
                      AS DOUBLE) / 700.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2' AND p_size < 10
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG against the same fact —
    decorrelated into one per-part aggregate joined back (the aggregate and
    the probe shuffle on the same key, so AQE co-partitions them). The
    threshold is exact cross-engine: quantities are whole numbers, so the
    double sum inside AVG is order-independent."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10)
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(avg_qty, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            # exact cents / 700: no 4-decimal tie is reachable (a tie
            # needs cents*200/7 odd, but 7|cents forces it even) and both
            # engines divide the identical integer-valued double
            # (lifted r9)
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 700.0, 4)"
            ).alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume",
    oracle="""
    SELECT c_name AS cust, o_orderkey AS orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(CAST(o_totalprice AS DOUBLE), 4) AS totalprice,
           ROUND(CAST(SUM(l_quantity) AS DOUBLE), 1) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY 1, 2, 3, 4
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-gated IN subquery → aggregate once, semi-join
    the fact against the qualifying keys, re-aggregate with the dims.
    Quantity sums are whole numbers → exact across engines."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_name").alias("cust"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.col("o_totalprice").cast("double"), 4).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity").cast("double"), 1).alias("total_qty"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name AS supplier, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders ON o_orderkey = l1.l_orderkey
                  JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, supplier
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-late-supplier hunt — one EXISTS (another
    supplier participated) and one NOT EXISTS (no other supplier was also
    late), both correlated with inequality residuals, as a semi- then
    anti-join against the same fact. "Late" = shipped >90 days after the
    order date (stands in for receiptdate > commitdate)."""
    late_cut = F.expr("INTERVAL 90 DAYS")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l1 = (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + late_cut)
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("ship3"),
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("k2")) & (l1.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("k3"))
            & (l1.l_suppkey != F.col("sk3"))
            & (F.col("ship3") > l1.o_orderdate + late_cut),
            "left_anti",
        )
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "supplier")
        .limit(10)
    )


@query(
    "q22_global_sales",
    oracle="""
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(CAST(SUM(CAST(ROUND(c_acctbal * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 4) AS totacctbal
    FROM (
      SELECT CAST(c_custkey % 7 AS INT) AS seg, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
    )
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY seg
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-dormant customers — above-average balance
    (uncorrelated scalar AVG, broadcast as a 1-row join) with no recent
    orders (anti-join). The key-mod segment stands in for the phone
    country code the fixture lacks."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).cast("int").alias("seg"))
        .agg(
            F.count("*").alias("numcust"),
            # exact cents on the 7-segment key (lifted r9)
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(c_acctbal * 100) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 100, 4)"
            ).alias("totacctbal"),
        )
    )


@query(
    "q20_promising_supplier",
    oracle="""
    WITH widget_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
    ),
    shipped AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN widget_parts ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 100
    )
    SELECT s_name AS supplier, n_name AS nation
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM shipped)
    ORDER BY supplier
    """,
)
def q20_promising_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (the last of the 22): suppliers with excess stock of
    a named part family — a semi-join against a grouped-HAVING subquery
    that is itself keyed by a semi-join (part name filter). The fixture
    lacks partsupp, so lineitem's (suppkey, partkey, quantity) plays the
    availqty role: "excess" = >100 units shipped in the window.

    Scale shape: widget_parts broadcasts into the lineitem scan (map-side
    semi-join), the HAVING aggregate shuffles on the near-unique
    (suppkey, partkey) key with map-side partials, and the final IN is a
    left-semi broadcast against the small qualified-supplier set."""
    widget = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    shipped = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        load(spark, sf_dir, "supplier")
        .join(
            shipped,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_name").alias("supplier"), F.col("n_name").alias("nation"))
    )
