"""Join / set-op / sort operators (SURVEY.md §2.3, §2.6, §2.7).

Joins J1-J6 mirror the reference's surface (frequencyAnalysis.py joins and the
Stage.scala dataflow algebra); the GAP rows (semi/anti/range/as-of) are filled
with native Spark so the engine is a capability superset.

Scale notes: dimension sides are broadcast (no shuffle of the fact table);
the delta anti-join shuffles only on its composite key; the as-of join uses
the union+window trick (one shuffle on the partition key, no range explosion);
the range/band join broadcasts the band table so it is a map-side operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load


@query(
    "join_inner_dim",
    oracle="""
    SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(CAST(SUM(CAST(ROUND(s_acctbal * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 4) AS total_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_inner_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join fact x small dim (frequencyAnalysis.py:54).
    The dim is broadcast — no shuffle of the left side for the join."""
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        load(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_suppliers"),
            # exact cents on the 25-nation key (lifted r9)
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(s_acctbal * 100) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 100, 4)"
            ).alias("total_acctbal"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey AS custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_big_orders
    FROM customer c
    LEFT OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 50000) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left-outer equi-join (frequencyAnalysis.py:78) — right side
    optional, preserved keys on the left."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_outer")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: left-semi join (native)."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/J5 shape: left-anti join — the set-difference primitive the
    reference uses for missed-input validation (Stage.scala:195-210)."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


@query(
    "delta_antijoin",
    oracle="""
    SELECT o.o_orderkey AS input_key, o.o_orderdate AS version
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_linenumber = 1 AND l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate
    )
    """,
)
def delta_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4+P10: THE signature operator — incremental-work discovery as a
    left-anti join with a strict freshness inequality
    (reference Stage.scala:249-266: drop inputs that have a ledger row with
    timestamp strictly after the input's version).

    Fixture binding: inputs := orders (key, version=o_orderdate); ledger :=
    lineitem rows with l_linenumber=1 (processed-at := l_shipdate)."""
    inputs = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("input_key"),
        F.col("o_orderdate").alias("version"),
    )
    ledger = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(F.col("l_orderkey").alias("lkey"), F.col("l_shipdate").alias("ts"))
    )
    return inputs.join(
        ledger,
        (inputs.input_key == ledger.lkey) & (ledger.ts > inputs.version),
        "left_anti",
    )


@query(
    "rules_routing",
    oracle="""
    SELECT CASE WHEN regexp_matches(source, '^src[0-3]$') THEN 'bucket_a'
                WHEN regexp_matches(source, '^src[4-6]$') THEN 'bucket_b'
                ELSE 'common' END AS output,
           CAST(COUNT(*) AS BIGINT) AS n_inputs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def rules_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the Stage.rules PartialFunction[Input, Outputs] as a first-match
    when/otherwise chain over glob-compiled regexes (Stage.scala:169,
    TestMethod.scala:19-23) — fully codegen'd, no Python in the loop."""
    docs = load(spark, sf_dir, "documents")
    routed = docs.select(
        F.when(F.col("source").rlike("^src[0-3]$"), F.lit("bucket_a"))
        .when(F.col("source").rlike("^src[4-6]$"), F.lit("bucket_b"))
        .otherwise(F.lit("common"))
        .alias("output"),
        "n_chars",
    )
    return routed.groupBy("output").agg(
        F.count("*").alias("n_inputs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "ledger_upsert",
    oracle="""
    WITH old AS (
      SELECT s_suppkey AS k, s_acctbal AS v, 1 AS generation FROM supplier
    ), new AS (
      SELECT s_suppkey AS k, s_acctbal * 2 AS v, 2 AS generation
      FROM supplier WHERE s_suppkey % 2 = 0
    )
    SELECT k, v, generation FROM old
    WHERE NOT EXISTS (SELECT 1 FROM new WHERE new.k = old.k)
    UNION ALL
    SELECT k, v, generation FROM new
    """,
)
def ledger_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: ON-DUPLICATE-KEY-UPDATE merge (Runs.scala:93-102, runs.sql:11)
    as old.antiJoin(new).union(new) — see plans/ledger.py for the stateful
    Parquet-backed version."""
    sup = load(spark, sf_dir, "supplier")
    old = sup.select(
        F.col("s_suppkey").alias("k"),
        F.col("s_acctbal").alias("v"),
        F.lit(1).alias("generation"),
    )
    new = (
        sup.filter(F.col("s_suppkey") % 2 == 0)
        .select(
            F.col("s_suppkey").alias("k"),
            (F.col("s_acctbal") * 2).alias("v"),
            F.lit(2).alias("generation"),
        )
    )
    return old.join(new, "k", "left_anti").unionByName(new)


@query(
    "range_join_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 50000.0), ('medium', 50000.0, 150000.0),
             ('large', 150000.0, 1e18)
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 4) AS total_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: range (theta) join against a broadcast band table — a
    nested-loop join that stays map-side because the band side is tiny."""
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("medium", 50000.0, 150000.0),
         ("large", 150000.0, 1e18)],
        schema=T.StructType([
            T.StructField("band", T.StringType()),
            T.StructField("lo", T.DoubleType()),
            T.StructField("hi", T.DoubleType()),
        ]),
    )
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            # exact cents on the 3-band key (lifted r9)
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 100, 4)"
            ).alias("total_price"),
        )
    )


@query(
    "asof_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id AS click_id, c.user_id AS user_id,
           ROUND(p.purchase_value, 6) + 0.0 AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: as-of join via the union+window trick — no range explosion,
    one shuffle on the partition key (user_id), scales linearly.

    For each click, the most recent purchase value by the same user at
    ts <= click ts. Purchases are pre-deduped per (user, ts) so equal-ts
    semantics are well-defined (matches DuckDB ASOF >=)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("double").alias("pval"), F.lit(1).alias("kind"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id", "ts", "pval", F.lit(0).alias("kind"),
        )
    )
    merged = clicks.unionByName(purchases)
    # purchases sort before clicks at equal ts (kind 0 < 1) => '>=' semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_pval", F.last("pval", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            (F.round("last_pval", 6) + 0.0).alias("last_purchase_value"),
        )
    )


@query(
    "asof_join_forward",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id AS click_id, c.user_id AS user_id,
           ROUND(p.purchase_value, 6) + 0.0 AS next_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction (pandas merge_asof
    direction='forward') — completes the as-of matrix alongside
    asof_join (backward) and asof_join_nearest: each click matches the
    NEXT same-user purchase at ts >= click ts, the "what converts after
    this touch" attribution lookup that backward can't answer.

    Same union+window engine, mirrored: one user_id shuffle, a running
    `first(ignorenulls)` over the FORWARD frame of the same sort — no
    range-join explosion at any scale. Clicks sort before purchases at
    equal ts (kind 0 < 1) with currentRow in the frame, so a same-ts
    purchase matches — exactly DuckDB's ASOF `<=`. Purchases pre-dedupe
    per (user, ts) by MAX(value) so equal-ts semantics are well-defined
    on both engines."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("double").alias("pval"), F.lit(0).alias("kind"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id", "ts", "pval", F.lit(1).alias("kind"),
        )
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged.withColumn(
            "next_pval", F.first("pval", ignorenulls=True).over(w)
        )
        .filter(F.col("kind") == 0)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            (F.round("next_pval", 6) + 0.0).alias("next_purchase_value"),
        )
    )


# --- set operations (SURVEY.md §2.7) ---


@query(
    "setop_union_distinct",
    oracle="""
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000
      UNION
      SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    )
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: set union with distinct semantics (Stage.scala:192)."""
    a = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("k"))
    )
    b = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    return a.union(b).distinct()


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: set difference (Stage.scala:198)."""
    a = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return a.subtract(b)  # EXCEPT (distinct) — matches SQL EXCEPT


@query(
    "setop_intersect",
    oracle="""
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: intersect (native)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


# --- sorts / limits / top-k (SURVEY.md §2.6) ---


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: top-k = orderBy desc + limit — Spark executes TakeOrdered
    (per-partition heap + merge), no full sort. Tie-broken on orderkey for
    determinism."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_orderkey % 7 END AS band,
             o_totalprice AS price
      FROM orders
    ), r AS (
      SELECT CASE WHEN range % 8 = 7 THEN NULL ELSE range END AS band,
             range * 10.0 AS rate
      FROM range(8)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
           ROUND(CAST(SUM(CAST(ROUND(l.price * 100) AS HUGEINT)
                          * CAST(COALESCE(r.rate, 1.0) AS HUGEINT))
                      AS DOUBLE) / 100, 4) AS weighted
    FROM l JOIN r ON l.band IS NOT DISTINCT FROM r.band
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of dropping out — still a hash join (the null-safe
    comparator is a valid equi-key), not a theta join."""
    l = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 7)
        .alias("band"),
        F.col("o_totalprice").alias("price"),
    )
    r = spark.range(8).select(
        F.when(F.col("id") % 8 == 7, F.lit(None))
        .otherwise(F.col("id"))
        .alias("rband"),
        (F.col("id") * 10.0).alias("rate"),
    )
    return l.join(F.broadcast(r), l.band.eqNullSafe(r.rband)).agg(
        F.count("*").alias("n_matched"),
        # exact cents x integer-valued rate, single global group
        # (lifted r9)
        F.expr(
            "ROUND(CAST(SUM(CAST(ROUND(price * 100) AS DECIMAL(38,0))"
            " * CAST(COALESCE(rate, 1.0) AS DECIMAL(38,0)))"
            " AS DOUBLE) / 100, 4)"
        ).alias("weighted"),
    )


@query(
    "sample_hash_systematic",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 4) AS total_price
    FROM lineitem
    WHERE CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
    """,
)
def sample_hash_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sampling: hash the row key, keep hash%k==0.
    Unlike df.sample() this is reproducible across engines, runs, and
    partitionings — the property a training-data pipeline needs for
    auditable subsets. md5-derived so Spark and the oracle agree bit-for-bit."""
    li = load(spark, sf_dir, "lineitem")
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return li.filter(h32 % 10 == 0).agg(
        F.count("*").alias("n_sampled"),
        # exact cents, single global group (lifted r9)
        F.expr(
            "ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS"
            " DECIMAL(38,0))) AS DOUBLE) / 100, 4)"
        ).alias("total_price"),
    )


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 10
          < CASE WHEN lang = 'en' THEN 5 ELSE 2 END
    GROUP BY lang
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates (50% en, 20%
    other) decided by a key hash, not RNG — the same rows are kept on any
    engine, run, or partitioning, unlike df.sampleBy(). This is how a
    training pipeline rebalances language mix reproducibly. Pure
    map-side filter; the only shuffle is the reporting aggregate."""
    docs = load(spark, sf_dir, "documents")
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    rate = F.when(F.col("lang") == "en", 5).otherwise(2)
    return (
        docs.filter(h32 % 10 < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


_CAMPAIGNS = (
    ("launch", "1995-03-10", "1995-11-02"),
    ("steady", "1996-01-01", "1998-06-15"),
    ("overlap_promo", "1997-09-01", "1999-02-28"),
    ("winddown", "1999-02-28", "2001-05-05"),
    ("flash", "2000-12-24", "2001-01-07"),
)

_CAMPAIGN_VALUES = ", ".join(
    f"('{c}', DATE '{lo}', DATE '{hi}')" for c, lo, hi in _CAMPAIGNS
)

_INTERVAL_ORACLE = f"""
WITH campaigns(camp, lo, hi) AS (VALUES {_CAMPAIGN_VALUES})
SELECT camp, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                  AS DOUBLE) / 100, 4) AS total_price
FROM orders JOIN campaigns
  ON o_orderdate >= lo AND o_orderdate < hi
GROUP BY camp
"""


@query("join_interval_bucketed", oracle=_INTERVAL_ORACLE)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key (facts matched to
    arbitrary, overlapping validity windows — campaign attribution, IP
    ranges, versioned calendars), via the bucketing rewrite: each
    interval explodes to the coarse time buckets it covers, facts compute
    their bucket, and the join becomes bucket-EQUALITY plus a residual
    range filter. Catalyst gets a hash join where the naive formulation
    is a nested loop — this is the scale path when the interval side is
    too big to broadcast (range_join_bands covers the broadcastable
    case). Cost scales with intervals x buckets-spanned, not facts x
    intervals; bucket width tunes that trade (months here).

    Overlapping intervals are handled naturally: a fact matches once per
    covering interval. The oracle pins semantics with the plain theta
    join DuckDB can afford at fixture scale.
    """
    camps = spark.createDataFrame(
        [(c, lo, hi) for c, lo, hi in _CAMPAIGNS],
        "camp string, lo_s string, hi_s string",
    ).select(
        "camp",
        F.to_date("lo_s").alias("lo"),
        F.to_date("hi_s").alias("hi"),
    )
    # explode each interval to its covered month buckets; hi is exclusive
    # but trunc(hi) is still a candidate bucket when hi isn't month-aligned
    bucketed = camps.select(
        "camp",
        "lo",
        "hi",
        F.explode(
            F.expr("sequence(trunc(lo, 'MM'), trunc(hi, 'MM'), interval 1 month)")
        ).alias("m"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("od"), "o_totalprice"
    )
    return (
        orders.withColumn("m", F.trunc("od", "MM"))
        .join(bucketed, "m")
        .filter((F.col("od") >= F.col("lo")) & (F.col("od") < F.col("hi")))
        .groupBy("camp")
        .agg(
            F.count("*").alias("n_orders"),
            # exact-cents sum (see join_salted_skew — same sf0.1 drift)
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 100, 4)"
            ).alias("total_price"),
        )
    )


_NEAREST_TOL_US = 12 * 3600 * 1_000_000  # 12-hour match tolerance

_NEAREST_ORACLE = f"""
WITH clicks AS (
  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(CAST(ts AS TIMESTAMP))
),
b AS (
  SELECT c.event_id, c.user_id, c.us, p.us AS bus
  FROM clicks c ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND c.us >= p.us
),
f AS (
  SELECT c.event_id, p.us AS fus
  FROM clicks c ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND c.us <= p.us
)
SELECT b.event_id AS click_id, b.user_id,
  CASE
    WHEN b.bus IS NOT NULL AND b.us - b.bus <= {_NEAREST_TOL_US}
     AND (f.fus IS NULL OR b.us - b.bus <= f.fus - b.us)
      THEN b.us - b.bus
    WHEN f.fus IS NOT NULL AND f.fus - b.us <= {_NEAREST_TOL_US}
      THEN f.fus - b.us
  END AS gap_us,
  CASE
    WHEN b.bus IS NOT NULL AND b.us - b.bus <= {_NEAREST_TOL_US}
     AND (f.fus IS NULL OR b.us - b.bus <= f.fus - b.us)
      THEN 'backward'
    WHEN f.fus IS NOT NULL AND f.fus - b.us <= {_NEAREST_TOL_US}
      THEN 'forward'
  END AS direction
FROM b JOIN f ON f.event_id = b.event_id
"""


@query("asof_join_nearest", oracle=_NEAREST_ORACLE)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas merge_asof
    direction='nearest'): each click matches its temporally closest
    same-user purchase within a 12-hour tolerance — backward preferred
    on exact ties — reporting the signed-direction and exact gap. The
    backward-only form (asof_join) answers "state as of t"; nearest
    answers "which reading belongs to this event", the sensor/trade
    alignment semantics.

    Same union+window engine as asof_join — NO range-join explosion:
    one user_id shuffle, a backward running `last(ignorenulls)` and a
    forward running `first(ignorenulls)` over the SAME sort (two frames,
    one window exchange), then a per-row nearest decision. Equal-ts
    purchases sort before clicks, so backward includes gap-0 matches
    and wins the tie exactly as the oracle's CASE does. Gaps are exact
    integer microseconds — no float anywhere."""
    from ..tables import ntz_epoch_us

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        ntz_epoch_us("ts").alias("us"),
        F.lit(None).cast("bigint").alias("pus"),
        F.lit(1).alias("kind"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", ntz_epoch_us("ts").alias("us"))
        .distinct()
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "us",
            F.col("us").alias("pus"),
            F.lit(0).alias("kind"),
        )
    )
    merged = clicks.unionByName(purchases)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    scored = (
        merged.withColumn(
            "bus", F.last("pus", ignorenulls=True).over(wb)
        )
        .withColumn("fus", F.first("pus", ignorenulls=True).over(wf))
        .filter(F.col("kind") == 1)
    )
    gb = F.col("us") - F.col("bus")
    gf = F.col("fus") - F.col("us")
    back_ok = F.col("bus").isNotNull() & (gb <= _NEAREST_TOL_US)
    back_wins = back_ok & (F.col("fus").isNull() | (gb <= gf))
    fwd_ok = F.col("fus").isNotNull() & (gf <= _NEAREST_TOL_US)
    return scored.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.when(back_wins, gb).when(fwd_ok, gf).alias("gap_us"),
        F.when(back_wins, F.lit("backward"))
        .when(fwd_ok, F.lit("forward"))
        .alias("direction"),
    )


_RL_BAND = 2000  # acctbal blocking-band width (dollars)


@query(
    "record_linkage_score",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg,
             c_acctbal AS bal, right(c_name, 2) AS nd,
             CAST(floor(c_acctbal / {_RL_BAND}.0) AS BIGINT) AS band
      FROM customer
    ),
    p AS (
      SELECT a.k AS a_key, b.k AS b_key,
             CAST(round(abs(a.bal - b.bal) * 100) AS BIGINT) AS bal_diff_cents,
             a.nd = b.nd AS same_name_suffix
      FROM c a JOIN c b
        ON a.nk = b.nk AND a.seg = b.seg AND a.band = b.band
       AND a.k < b.k
    )
    SELECT a_key, b_key, bal_diff_cents, same_name_suffix,
           ROUND((CASE WHEN bal_diff_cents <= 2000 THEN 2.5
                       WHEN bal_diff_cents <= 20000 THEN 1.2
                       ELSE -0.6 END)
                 + (CASE WHEN same_name_suffix THEN 1.5 ELSE -0.2 END),
                 1) AS score,
           ((CASE WHEN bal_diff_cents <= 2000 THEN 2.5
                  WHEN bal_diff_cents <= 20000 THEN 1.2
                  ELSE -0.6 END)
            + (CASE WHEN same_name_suffix THEN 1.5 ELSE -0.2 END))
             >= 2.0 AS is_match
    FROM p
    """,
)
def record_linkage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage in the Fellegi-Sunter shape
    (JASA 1969): BLOCK candidate pairs on coarse keys, compute a
    per-field agreement vector for each pair, sum literal log-odds-style
    agreement weights into a match score, and threshold. Fields here:
    graded account-balance proximity (compared in exact integer CENTS so
    no float boundary flips an agreement tier cross-engine) and a
    name-suffix surrogate; blocking is (nation, segment, a 2000-dollar
    balance band).

    Scale shape: the blocking key is the ONLY shuffle key and the pair
    generation is a self-equi-join within blocks — never all-pairs. The
    balance band bounds block size the way dedup_minhash_lsh's bands do
    (the recall trade: a true match straddling a band boundary is lost,
    the standard blocking tradeoff — production stacks a second pass
    blocked on another key, exactly like multi-band LSH). Scoring is one
    codegen projection over candidate pairs. Emits every candidate pair
    with its agreement vector, score, and match flag (threshold 2.0) so
    the downstream reviewer sees near-misses too."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        F.expr("right(c_name, 2)").alias("nd"),
        F.floor(F.col("c_acctbal") / float(_RL_BAND)).cast("long").alias(
            "band"
        ),
    )
    a = c.alias("a")
    b = c.alias("b")
    p = a.join(
        b,
        (F.col("a.nk") == F.col("b.nk"))
        & (F.col("a.seg") == F.col("b.seg"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.k") < F.col("b.k")),
    ).select(
        F.col("a.k").alias("a_key"),
        F.col("b.k").alias("b_key"),
        F.expr("CAST(round(abs(a.bal - b.bal) * 100) AS BIGINT)").alias(
            "bal_diff_cents"
        ),
        (F.col("a.nd") == F.col("b.nd")).alias("same_name_suffix"),
    )
    w_bal = (
        F.when(F.col("bal_diff_cents") <= 2000, F.lit(2.5))
        .when(F.col("bal_diff_cents") <= 20000, F.lit(1.2))
        .otherwise(F.lit(-0.6))
    )
    w_nd = F.when(F.col("same_name_suffix"), F.lit(1.5)).otherwise(
        F.lit(-0.2)
    )
    return p.select(
        "a_key",
        "b_key",
        "bal_diff_cents",
        "same_name_suffix",
        F.round(w_bal + w_nd, 1).alias("score"),
        ((w_bal + w_nd) >= 2.0).alias("is_match"),
    )


_ASOF_TOL_US = 6 * 3600 * 1_000_000  # 6-hour match tolerance


@query(
    "asof_join_tolerance",
    oracle=f"""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id AS click_id, c.user_id AS user_id,
           CASE WHEN p.ts IS NOT NULL
                 AND epoch_us(CAST(c.ts AS TIMESTAMP))
                     - epoch_us(CAST(p.ts AS TIMESTAMP)) <= {_ASOF_TOL_US}
                THEN ROUND(p.purchase_value, 6) + 0.0 END
             AS last_purchase_value,
           COALESCE(p.ts IS NOT NULL
                    AND epoch_us(CAST(c.ts AS TIMESTAMP))
                        - epoch_us(CAST(p.ts AS TIMESTAMP))
                        <= {_ASOF_TOL_US}, FALSE) AS within_tolerance
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join WITH a match tolerance (pandas merge_asof's
    `tolerance=` parameter): the most recent purchase counts only when it
    happened within {h} hours of the click — the staleness guard every
    feature-store lookup wants (an hours-old price is a feature; a
    months-old one is a bug). Completes the as-of matrix
    (backward/forward/nearest/+tolerance).

    Same union+window engine as asof_join — ONE user_id exchange, no
    range explosion: the window additionally carries the matched row's
    OWN timestamp (last ignorenulls over the same frame), and the
    tolerance is a post-window filter in exact naive microseconds
    (timestampdiff on TIMESTAMP_NTZ — pure naive arithmetic, tz-proof).
    Stale matches degrade to NULL rather than dropping the left row,
    preserving left-join cardinality.
    """
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("double").alias("pval"),
        F.lit(None).cast("timestamp_ntz").alias("pts"),
        F.lit(1).alias("kind"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id", "ts", "pval",
            F.col("ts").alias("pts"), F.lit(0).alias("kind"),
        )
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hit = F.expr(
        "last_pts IS NOT NULL AND"
        f" timestampdiff(MICROSECOND, last_pts, ts) <= {_ASOF_TOL_US}"
    )
    return (
        merged.withColumn(
            "last_pval", F.last("pval", ignorenulls=True).over(w)
        )
        .withColumn("last_pts", F.last("pts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.when(hit, F.round("last_pval", 6) + 0.0).alias(
                "last_purchase_value"
            ),
            F.coalesce(hit, F.lit(False)).alias("within_tolerance"),
        )
    )


asof_join_tolerance.__doc__ = asof_join_tolerance.__doc__.format(
    h=_ASOF_TOL_US // 3_600_000_000
)


# Synthetic-but-deterministic coordinates in integer MICRO-DEGREES on a
# [0, 1°)² patch: md5-derived from the id (the module's hash device), so
# both engines place every point identically and all geometry below is
# EXACT integer arithmetic — no haversine/trig whose last-ulp drift
# could flip a borderline pair differently per engine.
_GEO_CELL_U = 10_000  # grid cell edge, micro-degrees (0.01°)
_GEO_R_U = 7_000  # match radius, micro-degrees


def _geo_xy_sql(idcol: str) -> tuple[str, str]:
    h = f"md5(CAST({idcol} AS VARCHAR))"
    return (
        f"CAST(('0x' || substring({h}, 1, 8)) AS BIGINT) % 1000000",
        f"CAST(('0x' || substring({h}, 9, 8)) AS BIGINT) % 1000000",
    )


_GEO_X_S, _GEO_Y_S = _geo_xy_sql("user_id")
_GEO_X_D, _GEO_Y_D = _geo_xy_sql("o_custkey")


_SPATIAL_ORACLE = f"""
WITH pts AS (
  SELECT user_id AS pid, {_GEO_X_S} AS x, {_GEO_Y_S} AS y
  FROM (SELECT DISTINCT user_id FROM events)
),
sites AS (
  SELECT o_custkey AS sid, {_GEO_X_D} AS x, {_GEO_Y_D} AS y
  FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey % 50 = 0)
),
probe AS (
  SELECT s.sid, s.x AS sx, s.y AS sy,
         (s.x // {_GEO_CELL_U}) + dx.d AS cx,
         (s.y // {_GEO_CELL_U}) + dy.d AS cy
  FROM sites s
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
),
pairs AS (
  SELECT p.sid, t.pid,
         (t.x - p.sx) * (t.x - p.sx) + (t.y - p.sy) * (t.y - p.sy)
           AS d2
  FROM probe p
  JOIN pts t ON t.x // {_GEO_CELL_U} = p.cx
            AND t.y // {_GEO_CELL_U} = p.cy
)
SELECT CAST(sid AS BIGINT) AS site_id, CAST(pid AS BIGINT) AS point_id,
       CAST(d2 AS BIGINT) AS dist2_u
FROM pairs WHERE d2 <= {_GEO_R_U * _GEO_R_U}
"""


@query("spatial_join_radius", oracle=_SPATIAL_ORACLE)
def spatial_join_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial radius join — the canonical distributed
    spatial pattern (GeoSpark/Sedona's partition-join): points and query
    sites snap to a {c}-µ° grid, each site probes its 3×3 cell
    neighborhood (cell edge > radius ⇒ the neighborhood provably covers
    the disc), and only cell-colocated pairs get the exact distance
    test — never the all-pairs cross join. Coordinates are md5-derived
    integer micro-degrees on a unit patch (documented synthetic stand-in
    for real lat/lon columns; the PLAN is the operator), so the distance
    test is EXACT integer d² ≤ r² on both engines — no haversine trig,
    whose last-ulp drift across libm/JVM could flip borderline pairs.

    Scale shape: the probe explode is a fixed 9× fan-out of the SITE
    side (the small side by the {m}-modulus filter); the join is an
    EQUI join on the cell key, so it shuffles on bounded keys and never
    degenerates to a nested loop (planlint-clean). Density skew (a hot
    cell) is the salted-join case, documented swap. At real-world scale
    the same plan runs with geohash prefixes as cell keys and a
    haversine refine tolerant of its float tail.

    Reference analog: the reference's region/locus overlap joins
    (variant-region containment in the aggregator's pipeline stages;
    SURVEY.md §2.3 range join) generalized to 2-D.
    """
    ev = load(spark, sf_dir, "events")
    pts = ev.select("user_id").distinct().select(
        F.col("user_id").alias("pid"),
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT) % 1000000"
        ).alias("x"),
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 9, 8),"
            " 16, 10) AS BIGINT) % 1000000"
        ).alias("y"),
    )
    orders = load(spark, sf_dir, "orders")
    sites = (
        orders.filter(F.expr("o_custkey % 50 = 0"))
        .select("o_custkey")
        .distinct()
        .select(
            F.col("o_custkey").alias("sid"),
            F.expr(
                "CAST(conv(substring(md5(CAST(o_custkey AS STRING)),"
                " 1, 8), 16, 10) AS BIGINT) % 1000000"
            ).alias("sx"),
            F.expr(
                "CAST(conv(substring(md5(CAST(o_custkey AS STRING)),"
                " 9, 8), 16, 10) AS BIGINT) % 1000000"
            ).alias("sy"),
        )
    )
    d3 = spark.range(-1, 2).select(F.col("id").alias("d"))
    probe = (
        sites.crossJoin(F.broadcast(d3.select(F.col("d").alias("dx"))))
        .crossJoin(F.broadcast(d3.select(F.col("d").alias("dy"))))
        .select(
            "sid",
            "sx",
            "sy",
            F.expr(f"(sx DIV {_GEO_CELL_U}) + dx").alias("cx"),
            F.expr(f"(sy DIV {_GEO_CELL_U}) + dy").alias("cy"),
        )
    )
    keyed = pts.select(
        "pid",
        "x",
        "y",
        F.expr(f"x DIV {_GEO_CELL_U}").alias("cx"),
        F.expr(f"y DIV {_GEO_CELL_U}").alias("cy"),
    )
    pairs = probe.join(keyed, ["cx", "cy"]).select(
        "sid",
        "pid",
        F.expr(
            "(x - sx) * (x - sx) + (y - sy) * (y - sy)"
        ).alias("d2"),
    )
    return pairs.filter(
        F.col("d2") <= _GEO_R_U * _GEO_R_U
    ).select(
        F.col("sid").cast("bigint").alias("site_id"),
        F.col("pid").cast("bigint").alias("point_id"),
        F.col("d2").cast("bigint").alias("dist2_u"),
    )


spatial_join_radius.__doc__ = spatial_join_radius.__doc__.format(
    c=_GEO_CELL_U, m=50
)
