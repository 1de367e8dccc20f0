"""Multi-way-join analytic queries (TPC-H-shaped) over the star schema —
the query class the reference's EMR jobs exist to run at scale (the bundled
payload `frequencyAnalysis.py` is a 2-join instance; these exercise the
3-to-6-relation plans Catalyst must order, broadcast, and push down).

Scale design: every dimension (region, nation, supplier, customer at high
selectivity) broadcasts; only the fact tables (orders, lineitem) shuffle, and
only when an aggregation key forces it. Filters are expressed on the scan
side so parquet row-group pruning and column pruning engage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey AS orderkey,
           ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4)
             AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority AS priority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (dim × fact × fact), filtered both sides
    of the date, grouped revenue, top-10. The customer side is filtered to
    one segment before joining, so it broadcasts."""
    cutoff = "1998-06-01"
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle="""
    SELECT n_name AS nation,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                          * CAST(ROUND((1 - l_discount) * 100) AS HUGEINT))
                      AS DOUBLE) / 1e4, 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a same-nation co-membership condition
    (c_nationkey = s_nationkey). region→nation→supplier chain collapses into
    broadcasts; the only shuffles are fact-side."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            # exact 1e-4 units on the 25-nation key (lifted r9;
            # bigint per-row product, decimal only at the SUM)
            F.expr(
                "ROUND(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS"
                " BIGINT) * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)"
                " AS DECIMAL(38,0))) AS DOUBLE) / 1e4, 4)"
            ).alias("revenue")
        )
        .select(F.col("n_name").alias("nation"), "revenue")
    )


@query(
    "exists_subquery",
    oracle="""
    SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) — decorrelated to a left-semi
    join on the correlation key plus the inequality predicate."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "not_exists_subquery",
    oracle="""
    SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    GROUP BY c_mktsegment
    """,
)
def not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS (customers with no orders) — a left-anti join, the same
    physical shape as the engine's delta computation (Stage.scala:249-263)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "in_subquery",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 4) AS total
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    GROUP BY o_orderstatus
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (uncorrelated subquery) — a left-semi join against the filtered,
    broadcast-able key set."""
    o = load(spark, sf_dir, "orders")
    rich = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    return (
        o.join(F.broadcast(rich), o.o_custkey == rich.c_custkey, "left_semi")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_orders"),
            # exact cents on the 3-status key (lifted r9)
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 100, 4)"
            ).alias("total"),
        )
    )


@query(
    "scalar_subquery_avg",
    oracle="""
    SELECT l_partkey AS partkey,
           ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 4) AS small_qty_price
    FROM lineitem l
    WHERE l_quantity < (
      SELECT 0.5 * AVG(l_quantity) FROM lineitem i
      WHERE i.l_partkey = l.l_partkey
    )
    GROUP BY l_partkey
    """,
)
def scalar_subquery_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): rows below half their
    part's mean quantity. Decorrelated to aggregate + equi-join; Spark
    rewrites the correlated form the same way."""
    li = load(spark, sf_dir, "lineitem")
    means = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(means, li.l_partkey == means.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("small_qty_price"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                          * CAST(ROUND((1 - l_discount) * 100) AS HUGEINT))
                      AS DOUBLE) / 1e4, 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue by customer, 4-way join +
    top-20. nation broadcasts; AQE converts the customer join to broadcast
    at this selectivity."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           ROUND(CAST(SUM(volume_1e4) AS DOUBLE) / 1e4, 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS yr,
             CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
               * CAST(ROUND((1 - l_discount) * 100) AS HUGEINT) AS volume_1e4
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension table joined twice under two
    aliases (supplier nation × customer nation) with a disjunctive
    cross-pair predicate — both alias joins broadcast."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("yr"),
            # exact 1e-4 units on the bounded (nation, nation, yr)
            # key (lifted r9; bigint per-row product, decimal at SUM)
            F.expr(
                "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                " * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)"
            ).alias("volume_1e4"),
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(
            F.expr(
                "ROUND(CAST(SUM(CAST(volume_1e4 AS DECIMAL(38,0)))"
                " AS DOUBLE) / 1e4, 4)"
            ).alias("revenue")
        )
    )


@query(
    "q12_priority_by_band",
    oracle="""
    SELECT CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_band,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q12_priority_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-sum aggregation (priority classes
    counted inside the aggregate, not by pre-splitting the input)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.when(F.col("l_quantity") < 10, "small")
            .when(F.col("l_quantity") < 30, "medium")
            .otherwise("large")
            .alias("qty_band")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'TYPE_1%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END) AS DOUBLE)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: global (group-less) ratio aggregate over a
    broadcast dimension join."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type").like("TYPE_1%"), rev).otherwise(0.0)
                )
                / F.sum(rev),
                6,
            ).alias("promo_share")
        )
    )


@query(
    "q19_disjunctive_pred",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                          * CAST(ROUND((1 - l_discount) * 100) AS HUGEINT))
                      AS DOUBLE) / 1e4, 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'BRAND_1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'BRAND_2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'BRAND_3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-armed disjunctive predicate spanning both
    join sides — Catalyst pushes the single-side conjuncts below the join
    and keeps the cross-side residual on the join."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    arm = lambda brand, lo, hi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(lo, hi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        arm("BRAND_1", 1, 15, 1, 20)
        | arm("BRAND_2", 10, 30, 10, 40)
        | arm("BRAND_3", 20, 50, 20, 50)
    ).agg(
        # exact 1e-4 units, single global group (lifted r9; bigint
        # per-row product, decimal only at the SUM)
        F.expr(
            "ROUND(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS"
            " BIGINT) * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)"
            " AS DECIMAL(38,0))) AS DOUBLE) / 1e4, 4)"
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )
