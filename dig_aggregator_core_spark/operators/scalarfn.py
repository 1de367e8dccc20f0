"""Scalar-function coverage: date/time arithmetic, string ops, math, array &
map functions, and JSON extraction (SURVEY.md §2.8 GAP rows — the reference
payload uses only basename/dirname/glob/NaN/arith, `Implicits.scala:23-32`,
`frequencyAnalysis.py:7,20-21,59-62`; everything here is the native-Spark
superset the rebuilt engine exposes).

All functions run JVM-side inside whole-stage codegen — no Python UDFs. Each
query pins cross-engine-identical semantics (rounding, truncation direction,
collation) so the DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST('2001-12-31' AS DATE)) AS INT) AS days_to_eoy,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: extract (year/month/day/quarter), truncation,
    interval arithmetic, day difference, end-of-month. All Catalyst
    built-ins; at scale these fold into the scan projection."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(
            F.lit("2001-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_eoy"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("month_end"),
    )


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey AS partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           CAST(length(p_name) AS INT) AS name_len,
           substring(p_name, 1, 5) AS name5,
           concat_ws('#', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           replace(p_type, ' ', '_') AS type_us,
           CAST(strpos(p_type, 'E') AS INT) AS first_e,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           trim(' ' || p_brand || ' ') AS brand_trim
    FROM part WHERE p_partkey % 50 = 0
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, length, substring, concat_ws, pad, replace,
    position, regexp capture, trim — the columnar superset of the
    reference's basename/dirname ops (Implicits.scala:23-32)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 50 == 0)
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.regexp_replace("p_type", " ", "_").alias("type_us"),
        F.instr(F.col("p_type"), "E").alias("first_e"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias(
            "brand_trim"
        ),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           abs(l_discount - 0.05) AS abs_d,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           ROUND(sqrt(l_quantity), 6) AS qty_sqrt,
           ROUND(ln(l_extendedprice + 1), 6) AS price_ln,
           ROUND(pow(l_tax + 1, 2), 6) AS tax_p1_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS d_sign,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem WHERE l_orderkey % 500 = 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: abs/ceil/floor/round/sqrt/ln/pow/sign/mod plus
    greatest/least — all codegen'd column expressions."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_p1_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("d_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           list_sort(list_distinct(toks))[1] AS min_tok,
           CAST(list_contains(toks, 'the') AS BOOLEAN) AS has_the,
           array_to_string(toks[1:3], '-') AS first3
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    WHERE doc_id % 20 = 0
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: size, distinct, element_at (positive/negative),
    sort, contains, slice+join. The split→transform pipeline shape matches
    the dedup/text operators' shingling step."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    return d.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.element_at(F.sort_array(F.array_distinct("toks")), 1).alias(
            "min_tok"
        ),
        F.array_contains("toks", "the").alias("has_the"),
        F.concat_ws("-", F.slice("toks", 1, 3)).alias("first3"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           map(['type'], [event_type])['type'][1] AS type_via_map
    FROM events GROUP BY event_type
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: construct from arrays + key lookup (round-trips a
    value through a map column)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "type_via_map",
            F.element_at(
                F.map_from_arrays(
                    F.array(F.lit("type")), F.array(F.col("event_type"))
                ),
                "type",
            ),
        )
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (get_json_object — the columnar
    form of the reference's driver-side json4s/json.loads parsing,
    Config.scala:26, commitRun.py:21)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey AS orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_band,
           CAST(o_totalprice IS NOT NULL AS BOOLEAN) AS has_price,
           if(o_orderpriority LIKE '1-%', 1, 0) AS urgent
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar functions: coalesce/nullif, CASE WHEN band,
    null test, if + LIKE."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_or_open"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.col("o_totalprice").isNotNull().alias("has_price"),
        F.when(F.col("o_orderpriority").like("1-%"), 1)
        .otherwise(0)
        .alias("urgent"),
    )


@query(
    "fn_safe_arithmetic",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           CAST(l_extendedprice / NULLIF(l_quantity - 1.0, 0)
                AS DOUBLE) AS unit_price_m1,
           TRY_CAST(CASE WHEN l_linenumber % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(l_linenumber AS VARCHAR) END
                    AS BIGINT) AS parsed
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def fn_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: Spark 4 runs ANSI mode by default, so a
    division by zero or bad cast FAILS the job instead of silently
    NULLing (the pre-4.0 behavior). try_divide / try_cast are the
    explicit opt-outs — NULL on error, job survives. The oracle expresses
    the same contract portably (NULLIF guard, TRY_CAST); quantity-1 hits
    zero for single-unit lines, so the NULL path is exercised."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        # unrounded on purpose: IEEE division of identical doubles is
        # bit-identical cross-engine, while ROUND's tie-breaking is not
        # (2-decimal prices / small ints hit exact .5 ties constantly)
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 1.0)
        .cast("double")
        .alias("unit_price_m1"),
        F.when(
            F.col("l_linenumber") % 3 == 0, F.lit("not-a-number")
        )
        .otherwise(F.col("l_linenumber").cast("string"))
        .try_cast("bigint")
        .alias("parsed"),
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data via the VARIANT type (Spark 4): `parse_json`
    once into a binary-encoded variant, then typed `variant_get` path
    extraction — schema-on-read without a fixed struct schema, the
    modern replacement for repeated `get_json_object` string re-parsing.

    At scale this is the difference between parsing the JSON text N
    times (once per extracted path) and once total: the variant encodes
    to a compact binary tree, and every `variant_get` is a pointer walk.
    Catalyst also prunes unused variant paths during parquet
    read/shuffle (variant shredding). The oracle is DuckDB's own JSON
    path extraction over the same column.
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "v", F.parse_json("props")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("variant_get(v, '$.k', 'bigint')")).alias("sum_k"),
        F.max(F.expr("variant_get(v, '$.k', 'bigint')")).alias("max_k"),
    )


@query(
    "fn_decimal_exact",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_exact,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_exact,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS max_exact
    FROM orders GROUP BY o_orderstatus
    """,
)
def fn_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic — the money path. Double aggregation is
    order-dependent in the last ulps (every other oracle here rounds to
    compensate); DECIMAL(18,4) sums are EXACT and associative, so this op
    needs no rounding anywhere: any summation order, any partitioning,
    any engine produces the identical digits. That exactness is why
    financial columns aggregate as decimals at 100 TB even though the
    unscaled-long arithmetic is slower than doubles per row.

    Spark widens DECIMAL(18,4) sums to DECIMAL(28,4) against overflow.
    The average is derived from that exact sum by ONE double division
    (identical op on both engines, so identical to the last bit) rather
    than each engine's native decimal AVG — Spark's AVG divides in exact
    decimal (HALF_UP) while DuckDB's AVG over DECIMAL accumulates in
    floating point, so the two AVGs can differ in the final digit as row
    counts grow. Sums/max cast to DOUBLE only at the boundary (one exact
    decimal -> nearest double conversion, same result on any engine)
    because the comparison harness's pandas round-trip represents DECIMAL
    columns engine-specifically; the sum aggregation itself is exact.
    """
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.sum(dec).cast("double").alias("total_exact"),
        F.round(
            F.sum(dec).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_exact"),
        F.max(dec).cast("double").alias("max_exact"),
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' ||
             CAST(doc_id AS VARCHAR) || '?lang=' || lang ||
             '&v=' || CAST(doc_id % 5 AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol
    FROM u
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via Spark's dedicated `parse_url` (HOST / PATH /
    QUERY-key / PROTOCOL extraction) — the scalar family every
    crawl-derived corpus pipeline leans on (url_domain_blocklist does the
    policy join; this is the parsing layer under it). URLs are
    synthesized deterministically from the documents table so the oracle
    can re-derive the exact same strings and parse them with plain
    regexes — proving Spark's specialized parser agrees with the
    grammar, not just with itself.

    Per-row codegen expressions only: zero shuffle, linear scan,
    embarrassingly parallel at any scale."""
    u = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v="),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
    )
