"""Scale-technique operators: salted joins for skewed keys, bucketed
co-located joins, and an Arrow-batched grouped-aggregate UDAF.

These demonstrate (with oracle-checked results) the three techniques the
engine leans on when AQE alone isn't enough at 100 TB: key salting splits a
hot key across tasks; bucketing pre-shuffles both sides of a recurring join
ONCE at write time so every later join is exchange-free; Pandas UDAFs keep
unavoidable Python vectorized over Arrow batches.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..tables import load

_SALT = 8


@query(
    "join_salted_skew",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                          * CAST(ROUND(f.rate * 10) AS HUGEINT))
                      AS DOUBLE) / 1000, 4) AS adjusted
    FROM lineitem l
    JOIN (SELECT 'A' AS flag, 0.9 AS rate UNION ALL
          SELECT 'N', 1.0 UNION ALL
          SELECT 'R', 1.1) f ON l.l_returnflag = f.flag
    GROUP BY l_returnflag
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: l_returnflag has only 3 values — the worst-case skewed
    key (every row lands on one of 3 reducers in a plain shuffle join).
    Salting appends a random-free deterministic salt (row-derived mod) to
    the fact key and explodes the dim side across all salts, spreading each
    hot key over `_SALT` tasks. Result is identical to the unsalted join,
    which the oracle checks. (With AQE skew-join this is often automatic;
    salting is the explicit form for when it isn't.)"""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_orderkey") % _SALT).cast("int")
    )
    rates = spark.createDataFrame(
        [("A", 0.9), ("N", 1.0), ("R", 1.1)], "flag string, rate double"
    )
    salted_rates = rates.crossJoin(
        spark.range(_SALT).select(F.col("id").cast("int").alias("salt"))
    )
    return (
        li.join(
            salted_rates,
            (li.l_returnflag == salted_rates.flag)
            & (li.salt == salted_rates.salt),
        )
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count("*").alias("n_items"),
            # exact milli-units (cents x rate-tenths): double accumulation
            # drifted a last-ulp vs the oracle at sf0.1; the integer sum
            # is exact and the single /1000 + ROUND of a 3-decimal value
            # is engine-deterministic
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS"
                " DECIMAL(38,0)) * CAST(ROUND(rate * 10) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 1000, 4)"
            ).alias("adjusted"),
        )
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 4) AS total
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both fact tables written `bucketBy(16,
    orderkey)` once, then joined WITHOUT any exchange — the buckets line up
    and each task joins its bucket pair (SortMergeJoin with zero shuffle;
    verify with .explain: no Exchange above the scans). At 100 TB this is
    the difference between re-shuffling two fact tables on every join and
    paying the shuffle once at ingest."""
    wh = os.path.join(tempfile.gettempdir(), "spark_graft_scratch", "bucketed")
    o_tbl, l_tbl = "graft_orders_b", "graft_lineitem_b"
    for tbl in (o_tbl, l_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # external tables: explicit paths, so no dependence on the (static)
    # warehouse dir of whatever session the driver hands us
    load(spark, sf_dir, "orders").write.mode("overwrite").option(
        "path", f"{wh}/orders_b"
    ).bucketBy(16, "o_orderkey").sortBy("o_orderkey").saveAsTable(o_tbl)
    load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).write.mode("overwrite").option("path", f"{wh}/lineitem_b").bucketBy(
        16, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable(l_tbl)
    o = spark.table(o_tbl)
    li = spark.table(l_tbl)
    # merge hint pins SortMergeJoin even where the fixture-sized side would
    # broadcast, so the plan exhibits the production shape: SMJ over two
    # Bucketed:true scans with NO exchange on the join keys
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_items"),
            # exact-cents sum (see join_salted_skew — same sf0.1 drift)
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS"
                " DECIMAL(38,0))) AS DOUBLE) / 100, 4)"
            ).alias("total"),
        )
    )


def _geomean_udf():
    # created lazily — pandas_udf type resolution wants an active session
    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        """Grouped-agg Pandas UDAF: geometric mean, vectorized over Arrow
        batches (the slow-path escape hatch done the fast way — never
        row-at-a-time Python)."""
        import numpy as np

        return float(np.exp(np.log(v[v > 0]).mean()))

    return geomean


@query(
    "udaf_pandas_geomean",
    oracle="""
    SELECT l_returnflag AS returnflag,
           ROUND(EXP(AVG(LN(l_extendedprice))), 4) AS geomean_price
    FROM lineitem WHERE l_extendedprice > 0
    GROUP BY l_returnflag
    """,
)
def udaf_pandas_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via a grouped-agg pandas_udf (Arrow transfer, one
    Python call per group-partition — not per row). The oracle is the
    closed-form SQL equivalent, pinning numeric agreement to 4 places."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    geomean = _geomean_udf()
    return (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(F.round(geomean("l_extendedprice"), 4).alias("geomean_price"))
    )


@query(
    "join_hint_shuffle_hash",
    oracle="""
    SELECT l_returnflag AS returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                          * CAST(ROUND((1 - l_discount) * 100) AS HUGEINT))
                      AS DOUBLE) / 1e4, 4) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_returnflag
    """,
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy override: `.hint("shuffle_hash")` forces a
    ShuffledHashJoin where the planner would pick sort-merge or broadcast —
    the escape hatch when statistics mislead (SHJ skips both sort passes
    when one side fits a per-partition hash map but is too big to
    broadcast). The result is strategy-invariant, which the oracle pins;
    the plan swap is the point (`.explain` shows ShuffledHashJoin)."""
    li = load(spark, sf_dir, "lineitem")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    return (
        li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count("*").alias("n"),
            # exact 1e-4 units on the 3-flag key (lifted r9; bigint
            # per-row product, decimal only at the SUM)
            F.expr(
                "ROUND(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS"
                " BIGINT) * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)"
                " AS DECIMAL(38,0))) AS DOUBLE) / 1e4, 4)"
            ).alias("revenue"),
        )
    )


@query(
    "mapinarrow_vector_norm",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> x * x)),
                 (acc, x) -> acc + x)), 6) AS l2_norm,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings
    """,
)
def mapinarrow_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native batch UDF surface: mapInArrow hands each partition as
    pyarrow RecordBatches — zero pandas conversion, the leanest Python hot
    path Spark offers (below it only JVM expressions remain). The kernel
    never touches individual rows from Python: the list column's flat
    float64 value buffer becomes ONE numpy view, squared vectorized, and
    summed per row with a single `np.add.reduceat` over the list offsets
    (reduceat accumulates each segment left-to-right — the same element
    order as the oracle's sequential list_reduce fold). The shape to copy
    for real vector workloads: list columns in, numpy views over Arrow
    buffers, segment reduces — no per-row or per-dimension Python."""
    import pyarrow as pa
    import numpy as np

    def norm_batches(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id")
            emb = batch.column("embedding")
            # absolute offsets index into the underlying flat values buffer
            offsets = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            values = emb.values.to_numpy(zero_copy_only=False)
            starts, ends = offsets[:-1], offsets[1:]
            dims = (ends - starts).astype(np.int32)
            # a sliced ListArray's flat buffer can extend past the last
            # offset; truncate so the final reduceat segment stops there
            sq = values[: offsets[-1]] * values[: offsets[-1]] if len(
                offsets
            ) else values * values
            acc = np.zeros(len(dims), dtype=np.float64)
            nonempty = dims > 0
            if nonempty.any():
                # consecutive nonempty starts bound exactly one segment each
                # (empty segments contribute no values between them)
                acc[nonempty] = np.add.reduceat(sq, starts[nonempty])
            yield pa.RecordBatch.from_arrays(
                [
                    vec_ids,
                    pa.array(np.round(np.sqrt(acc), 6), type=pa.float64()),
                    pa.array(dims, type=pa.int32()),
                ],
                names=["vec_id", "l2_norm", "dim"],
            )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
    )
    return emb.mapInArrow(
        norm_batches, schema="vec_id bigint, l2_norm double, dim int"
    )


@query(
    "udtf_sentence_split",
    oracle="""
    WITH sp AS (
      SELECT doc_id, string_split(text, '. ') AS parts FROM documents
      WHERE doc_id % 20 = 0
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS sent_idx,
           parts[CAST(i AS INT)] AS sentence,
           CAST(length(parts[CAST(i AS INT)]) AS INT) AS n_chars
    FROM sp, LATERAL unnest(range(1, len(parts) + 1)) AS u(i)
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 3.5+ `@udtf`): one input
    row expands to N output rows through a lateral join — the API for
    Python logic whose output cardinality varies per row (sentence/
    passage splitting, chunking for context windows), where a scalar UDF
    can't change row count and explode() alone can't run Python.

    The splitter itself is deliberately trivial (the native-expression
    twin is text ops' split/explode); what this registers is the UDTF
    machinery: per-partition Python workers streaming Arrow batches
    through a generator, composed LATERAL with the scan — no collect, no
    shuffle, embarrassingly parallel. Real sentence segmenters (spaCy,
    pysbd) drop into eval() unchanged.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, part in enumerate(text.split(". ")):
                yield i, part, len(part)

    spark.udtf.register("sentence_split", SentenceSplit)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    docs.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT d.doc_id, t.sent_idx, t.sentence, t.n_chars "
        "FROM udtf_docs_in d, LATERAL sentence_split(d.text) t"
    )


_BLOOM_M = 1 << 13  # bitmap bits; 8192 bits = 128 longs of driver metadata
_BLOOM_K = 3  # hash functions (seeds 0..k-1 into xxhash64)


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 2) AS total
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime row pruning, built from first principles as a
    DataFrame composition (Spark's own bloom_filter_agg/might_contain pair
    is internal-only, not SQL-callable): build a k-hash bitmap over the
    dim-side join keys, prefilter the FACT side with a pure codegen bit
    test, then run the exact semi join over the survivors. The bloom has
    no false negatives, so prefilter + exact join == plain semi join —
    which is exactly what the oracle pins.

    Scale shape: the bitmap is _BLOOM_M bits (128 longs here) regardless
    of dim cardinality — it is metadata, collected driver-side like the
    k-means centroids and re-broadcast as an array literal inside the
    filter expression. The bit test (xxhash64 -> element_at -> shiftright
    -> mask) is whole-stage-codegen, so fact rows are dropped DURING the
    scan, before the join exchange: at 100 TB with a 1% selective dim,
    ~99% of fact bytes never enter the shuffle. This is the manual form
    of the runtime filtering AQE does JVM-side, kept explicit so the
    pruning applies even across stages AQE can't see through. False
    positives only cost exactness of the *pruning* rate, never of the
    result — the semi join after is authoritative."""
    cust = load(spark, sf_dir, "customer")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    # bitmap build: k hash positions per dim key, distinct -> <= M ints of
    # metadata on the driver (the documented metadata-collect pattern)
    pos_cols = [
        F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(_BLOOM_M)).alias(f"p{i}")
        for i in range(_BLOOM_K)
    ]
    positions = (
        dim.select(F.explode(F.array(*[c for c in pos_cols])).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_M // 64)
    for r in positions:
        p = int(r["p"])
        words[p // 64] |= 1 << (p % 64)
    # signed-long representation for the SQL literal
    words = [(w + 2**63) % 2**64 - 2**63 for w in words]

    fact = load(spark, sf_dir, "orders")
    # one parsed expression, not 128 F.lit py4j calls (guide §5; the
    # privacy_dp_counts lesson) — identical folded literal array
    mask = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    tests = [
        F.expr(
            f"(shiftright(element_at(_bloom, "
            f"CAST(pmod(xxhash64(o_custkey, {i}), {_BLOOM_M}) / 64 AS INT) + 1), "
            f"CAST(pmod(pmod(xxhash64(o_custkey, {i}), {_BLOOM_M}), 64) AS INT)) "
            f"& 1) = 1"
        )
        for i in range(_BLOOM_K)
    ]
    pred = tests[0]
    for t in tests[1:]:
        pred = pred & t
    prefiltered = fact.withColumn("_bloom", mask).filter(pred).drop("_bloom")
    exact = prefiltered.join(
        dim.withColumnRenamed("k", "o_custkey"), "o_custkey", "semi"
    )
    return exact.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact cents on the 5-priority key (lifted r9)
        F.expr(
            "ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS"
            " DECIMAL(38,0))) AS DOUBLE) / 100, 2)"
        ).alias("total"),
    )


_CARD_B = 64  # key-hash buckets for the cardinality probe


@query(
    "join_cardinality_probe",
    oracle=f"""
    WITH lb AS (
      SELECT CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
               AS BIGINT) % {_CARD_B} AS b,
             CAST(COUNT(*) AS BIGINT) AS nl
      FROM orders GROUP BY 1
    ),
    rb AS (
      SELECT CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
               AS BIGINT) % {_CARD_B} AS b,
             CAST(COUNT(*) AS BIGINT) AS nr
      FROM customer GROUP BY 1
    ),
    est AS (
      SELECT CAST(SUM(lb.nl * rb.nr) AS BIGINT) AS est_rows
      FROM lb JOIN rb ON lb.b = rb.b
    ),
    act AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT est_rows, actual_rows,
           CAST((est_rows * 1000000) // actual_rows AS BIGINT)
             AS overestimate_micro
    FROM est, act
    """,
)
def join_cardinality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimation — the sizing probe a pipeline (or
    a planner without fresh stats) runs before committing to a join
    strategy: bucket both sides' keys into B={b} hash buckets, estimate
    |A join B| as sum(n_a[b] * n_b[b]) — an upper bound that is exact
    when each bucket holds one distinct key and degrades gracefully with
    collisions — and report it against the true join count, with the
    overestimate ratio in integer micro-units.

    The probe costs two aggregations whose shuffles carry at most B rows
    after map-side combine — measuring before a 100 TB join costs almost
    nothing next to running it, which is the operational point: an
    estimate of 10^14 output rows aborts a bad join BEFORE it launches
    (same measure-then-act family as skew_diagnose_keys). The fixture
    also runs the actual join, so the oracle pins both numbers."""
    h = lambda c: (
        F.conv(
            F.substring(F.md5(F.col(c).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % _CARD_B
    )
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lb = orders.groupBy(h("o_custkey").alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nl")
    )
    rb = customer.groupBy(h("c_custkey").alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nr")
    )
    est = (
        lb.join(rb, "b")
        .agg(F.sum(F.col("nl") * F.col("nr")).cast("bigint").alias("est_rows"))
    )
    act = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).agg(F.count(F.lit(1)).cast("bigint").alias("actual_rows"))
    )
    return est.crossJoin(act).select(
        "est_rows",
        "actual_rows",
        F.expr(
            "CAST((est_rows * 1000000) DIV actual_rows AS BIGINT)"
        ).alias("overestimate_micro"),
    )


join_cardinality_probe.__doc__ = join_cardinality_probe.__doc__.format(
    b=_CARD_B
)
