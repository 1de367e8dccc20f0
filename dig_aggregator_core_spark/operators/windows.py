"""Window-function operators (SURVEY.md §2.5).

The reference's only window-shaped idiom is greatest-per-group via
max-then-join-back (frequencyAnalysis.py:31-35 + :54); W1 exposes both forms.
The GAP rows (ranking, analytic lag/lead, running frames) are filled native.

Scale note: a window = one shuffle on partitionBy keys + per-partition sort.
Partition keys here are mid-cardinality (custkey/user_id), so no single task
hot-spots; for skewed keys the salting helper in functions/scalars.py applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "greatest_per_group",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           o_totalprice AS totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def greatest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: greatest-per-group — the window form of the reference's
    max-then-join idiom (frequencyAnalysis.py:31-35 + :54)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "window_rank",
    oracle="""
    SELECT s_suppkey AS suppkey, s_nationkey AS nationkey,
           CAST(RANK() OVER (PARTITION BY s_nationkey
                             ORDER BY s_acctbal DESC) AS INT) AS bal_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal DESC) AS INT)
             AS bal_dense_rank
    FROM supplier
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: rank / dense_rank."""
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_nationkey").alias("nationkey"),
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: analytic lag/lead over an event stream, deterministic
    ordering via (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW), 6) + 0.0 AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: cumulative frame (rowsBetween unboundedPreceding..current).
    Running sums in a fixed order are deterministic cross-engine."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.round(F.sum("value").over(w), 6) + 0.0).alias("running_value"),
    )


@query(
    "window_sliding_rows",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 6) + 0.0 AS ma3
    FROM events
    """,
)
def window_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: bounded sliding frame (3-row moving average)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.round(F.avg("value").over(w), 6) + 0.0).alias("ma3"),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
             AS price_quartile
    FROM orders
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP fill: ntile quartiles — the LITERAL form: a global window is
    a single-partition sort (one task at any scale), so this form is
    only for bounded inputs. The scale path is :func:`window_ntile_cuts`
    below: identical output, computed via bounded quantile-cut buckets +
    per-bucket offsets, parallel end to end (VERDICT r10 task 3)."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


@query(
    "window_ntile_cuts",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
             AS price_quartile
    FROM orders
    """,
)
def window_ntile_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe NTILE twin (VERDICT r10 task 3) — EXACT ntile output
    (same oracle as window_ntile) with no global single-partition sort:

    1. ~B approx-quantile cuts of the order key are collected once
       (bounded driver data; their VALUES only affect load balance, not
       the result, so approxQuantile's estimation error is harmless);
    2. each row gets a bucket = #cuts <= key — monotone in the key and
       tie-stable, so (bucket, key, unique tiebreak) is the global sort
       order;
    3. per-bucket counts (<= B rows, one partial-agg shuffle) turn into
       cumulative offsets + the grand total WITHIN the plan (a window
       over the <= B-row counts relation — metadata-sized, so its
       single-partition sort is free), broadcast back; no second driver
       collect round-trip;
    4. global rank = bucket offset + row_number within bucket (the only
       corpus-sized window partitions by bucket: ~N/B rows per task),
       and the exact NTILE bucket-size formula (first N%n tiles get
       ceil(N/n) rows) maps rank -> tile as pure integer arithmetic on
       the broadcast total.

    At 100 TB each stage is parallel: the quantile sketch and count agg
    are partial-agg map-side folds, the final window sorts ~N/B rows per
    task. Skew caveat: a single key VALUE dominating the relation
    collapses into one bucket (same caveat as any range partitioning) —
    the unique tiebreak keeps the output exact regardless, only balance
    suffers."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    n_tiles, n_buckets = 4, 64
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = sorted(set(orders.stat.approxQuantile("o_totalprice", probs, 0.01)))
    cuts_arr = "array(" + ", ".join(f"CAST({c!r} AS DOUBLE)" for c in cuts) + ")"
    bucketed = orders.withColumn(
        "bkt",
        F.expr(f"size(filter({cuts_arr}, c -> c <= o_totalprice))"),
    )
    # <= B+1 count rows: offsets + grand total computed IN the plan (two
    # windows over the metadata-sized counts relation) instead of a
    # collect + createDataFrame round-trip — one driver job saved per
    # run, same exact integers either way
    counts = bucketed.groupBy("bkt").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w_off = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_df = counts.select(
        "bkt",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0).cast("bigint"))
        .alias("off"),
        F.sum("cnt").over(w_tot).alias("total"),
    )
    w = Window.partitionBy("bkt").orderBy("o_totalprice", "o_orderkey")
    ranked = bucketed.join(F.broadcast(off_df), "bkt").withColumn(
        "rn", F.row_number().over(w) + F.col("off")
    )
    # NTILE's exact fill: q = N div n rows per tile, the first rem tiles
    # take one extra row. Integer DIV end to end — no float rounding at
    # any N. q=0 (fewer rows than tiles) routes every row through the
    # first branch, so the greatest(q,1) guard never changes a result.
    tile = F.expr(
        f"CASE WHEN rn <= (total % {n_tiles}) * (total DIV {n_tiles} + 1)"
        f" THEN (rn - 1) DIV (total DIV {n_tiles} + 1)"
        f" ELSE (total % {n_tiles})"
        f"  + (rn - (total % {n_tiles}) * (total DIV {n_tiles} + 1) - 1)"
        f"    DIV greatest(total DIV {n_tiles}, 1L)"
        f" END + 1"
    )
    return ranked.select(
        F.col("o_orderkey").alias("orderkey"),
        tile.cast("int").alias("price_quartile"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW), 4) AS near_total
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame (RANGE BETWEEN n PRECEDING): sums orders
    whose key lies within 100 of the current row's key — a frame defined on
    ORDER-BY VALUES, not row positions (contrast window_sliding_rows)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rangeBetween(-100, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("near_total"),
    )


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT o_orderkey AS orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS top_order,
           NTH_VALUE(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED
             PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution/navigation window functions: percent_rank, cume_dist,
    first_value, nth_value — rounding out §2.5 beyond ranking and frames.
    The unique orderkey tiebreak makes every output deterministic; nth_value
    needs the full-partition frame (default frame stops at CURRENT ROW)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("top_order"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
    )


@query(
    "window_running_distinct",
    oracle="""
    WITH f AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS occ
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM f
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — which no engine
    supports directly (DISTINCT is not frame-decomposable) — rewritten as
    two decomposable windows: flag each row that is the FIRST occurrence
    of its (user, event_type) by (ts, event_id), then running-sum the
    flags per user. The rewrite is exact, not approximate, and every
    step is whole-stage-codegen window machinery.

    Scale: one exchange on (user_id, event_type) for the occurrence
    ranking, one on user_id for the running sum — both keyed, no global
    sort. State per task is a single counter; contrast the naive
    collect_set-over-window, which carries the full distinct set in every
    frame and explodes on high-cardinality types."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w_occ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "is_new", (F.row_number().over(w_occ) == 1).cast("bigint")
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("is_new").over(w_run).alias("distinct_types_so_far"),
    )


_MED_FRAME = 6  # ROWS BETWEEN 6 PRECEDING AND CURRENT ROW (7-row frame)


@query(
    "window_moving_median",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(median(CAST(ROUND(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {_MED_FRAME} PRECEDING AND CURRENT ROW
           ) / 100.0, 6) AS moving_median
    FROM events
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT moving median over a bounded ROWS frame ({k}+1 trailing
    rows per user) — the robust smoother a metrics pipeline wants where
    a moving average is outlier-dominated, and a window aggregate Spark
    has no built-in for (percentile over a moving frame is not
    frame-decomposable). Rewritten as collect_list over the frame →
    array_sort → middle element (mean of the two middles on even
    frames, matching DuckDB's interpolating median). Values are lifted
    to integer cents first so the even-frame midpoint average is exact
    on both engines.

    Scale: ONE exchange on user_id; per-row work is O(f log f) on the
    f={k}+1-element frame and per-task state is the f-element buffer —
    bounded, unlike an unbounded-frame percentile which buffers the
    whole partition. This rewrite is the right shape for any
    small-f robust rolling statistic (trimmed means the same way via
    slice()); for large f swap in a pair of running heaps inside
    applyInPandasWithState (the streaming stateful family's device).
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_MED_FRAME, Window.currentRow)
    )
    frame = ev.select(
        "event_id",
        "user_id",
        F.collect_list(
            F.expr("CAST(ROUND(value * 100) AS BIGINT)")
        ).over(w).alias("fr"),
    )
    return frame.select(
        "event_id",
        "user_id",
        F.expr(
            "ROUND(CASE WHEN size(fr) % 2 = 1"
            " THEN CAST(array_sort(fr)[(size(fr) - 1) DIV 2] AS DOUBLE)"
            " ELSE (CAST(array_sort(fr)[size(fr) DIV 2 - 1] AS DOUBLE)"
            "       + array_sort(fr)[size(fr) DIV 2]) / 2.0"
            " END / 100.0, 6)"
        ).alias("moving_median"),
    )


window_moving_median.__doc__ = window_moving_median.__doc__.format(
    k=_MED_FRAME
)


_SKYLINE_ORACLE = """
WITH pts AS (
  SELECT source, n_chars,
         CAST((len(list_distinct(w)) * 1000000)
              // greatest(len(w), 1) AS BIGINT) AS div_micro,
         doc_id
  FROM (SELECT source, n_chars, doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents)
),
dd AS (
  SELECT source, n_chars, div_micro,
         CAST(MIN(doc_id) AS BIGINT) AS doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_dup
  FROM pts GROUP BY 1, 2, 3
),
sc AS (
  SELECT *,
         MAX(div_micro) OVER (PARTITION BY source
           ORDER BY n_chars DESC, div_micro DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
  FROM dd
)
SELECT source, CAST(n_chars AS BIGINT) AS n_chars, div_micro, doc_id,
       n_dup
FROM sc WHERE best_prev IS NULL OR div_micro > best_prev
"""


@query("feature_pareto_skyline", oracle=_SKYLINE_ORACLE)
def feature_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) per source — the classic
    Börszönyi/Kossmann SKYLINE OF operator: documents not dominated on
    (length, lexical diversity), i.e. the frontier a curation pass picks
    exemplars from ("as long AND as diverse as anything available").
    Dominance = ≥ on both axes with at least one strict.

    The O(n log n) sort-filter algorithm expressed as ONE window: after
    exact-duplicate (x, y) collapse, scan in (x DESC, y DESC) order —
    every earlier row has x>cur, or x=cur with y>cur (a dominator) — so
    a row is on the frontier iff its y strictly exceeds the running max
    of all earlier y. No self-join, no quadratic dominance test; the
    naive EXISTS anti-join is O(n²) and planlint-unexpressible at scale.
    Diversity is an exact integer micro ratio (distinct/total tokens),
    so ordering and the frontier test are integer-deterministic.

    Scale shape: one shuffle on source; the frontier window is a
    partition-local sorted scan (the window_rank class — per-source
    sort, never global). Exact-dup collapse happens in the same
    exchange and also bounds the window input. Reference analog:
    frequencyAnalysis.py's best-variant selection layer
    (frequencyAnalysis.py:31-35) lifted to multi-criteria dominance.
    """
    d = load(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("w"),
    )
    pts = d.select(
        "source",
        "n_chars",
        F.expr(
            "CAST((size(array_distinct(w)) * 1000000)"
            " DIV greatest(size(w), 1) AS BIGINT)"
        ).alias("div_micro"),
        "doc_id",
    )
    dd = pts.groupBy("source", "n_chars", "div_micro").agg(
        F.min("doc_id").cast("bigint").alias("doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_dup"),
    )
    w_sky = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("div_micro").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sc = dd.withColumn("best_prev", F.max("div_micro").over(w_sky))
    return sc.filter(
        F.col("best_prev").isNull()
        | (F.col("div_micro") > F.col("best_prev"))
    ).select(
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "div_micro",
        "doc_id",
        "n_dup",
    )
