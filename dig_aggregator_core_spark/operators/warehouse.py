"""Warehouse-maintenance operators: SCD2 (slowly-changing-dimension
type 2) merge — the versioned-history sibling of the ledger's
overwrite-upsert (plans/ledger.py, reference Runs.scala:77-116, which
keeps only the latest row per key). SCD2 instead closes the superseded
row (valid_to, is_current=false) and appends the new version, so the
dimension carries its full history.

Scale notes (100 TB dim): the merge is one full-outer sort-merge join on
the dimension key plus a union — no driver-side state, no window over
the whole dim. Change detection is a per-row comparison, so unchanged
keys stream through untouched. (The ledger's upsert broadcasts because
its table is metadata-sized; a billion-row dimension instead wants
exactly this co-partitioned join shape.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

NEW_KEY_OFFSET = 1_000_000  # synthetic insert keys in the update batch

_SCD2_ORACLE = f"""
WITH base AS (
  SELECT c_custkey AS custkey, c_acctbal AS bal FROM customer
),
upd AS (
  SELECT custkey, bal * 1.1 AS new_bal FROM base WHERE custkey % 3 = 0
  UNION ALL
  SELECT custkey + {NEW_KEY_OFFSET}, bal FROM base WHERE custkey % 5 = 0
),
j AS (
  SELECT COALESCE(b.custkey, u.custkey) AS custkey, b.bal, u.new_bal,
         b.custkey IS NOT NULL AS in_base,
         u.custkey IS NOT NULL AS in_upd
  FROM base b FULL OUTER JOIN upd u ON b.custkey = u.custkey
)
SELECT custkey, ROUND(bal, 4) AS acctbal,
       TIMESTAMP '2020-01-01' AS valid_from,
       TIMESTAMP '2021-01-01' AS valid_to, FALSE AS is_current
FROM j WHERE in_base AND in_upd AND new_bal <> bal
UNION ALL
SELECT custkey, ROUND(bal, 4) AS acctbal,
       TIMESTAMP '2020-01-01' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
FROM j WHERE in_base AND (NOT in_upd OR new_bal = bal)
UNION ALL
SELECT custkey, ROUND(new_bal, 4) AS acctbal,
       TIMESTAMP '2021-01-01' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
FROM j WHERE in_upd AND (NOT in_base OR new_bal <> bal)
"""


@query("scd2_merge", oracle=_SCD2_ORACLE)
def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge of an update batch into a versioned dimension: changed
    keys get their current row closed at the batch timestamp plus a new
    current version; unchanged and untouched keys pass through; unseen
    keys insert. The fixture batch updates every custkey%3 row (bal*1.1)
    and inserts a shifted copy of every custkey%5 row; a bal of exactly 0
    survives unchanged (0*1.1 = 0), exercising the changed-value
    predicate rather than mere key presence.

    One full-outer join on the key resolves all three cases; each joined
    row then emits its 1-2 output versions as a conditional struct array
    + explode, so the whole merge is a single pass — no persist, no
    union of re-filtered branches re-reading the join."""
    ts0 = F.lit("2020-01-01").cast("timestamp")
    ts1 = F.lit("2021-01-01").cast("timestamp")
    tnull = F.lit(None).cast("timestamp")
    base = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("bal")
    )
    upd = (
        base.filter(F.col("custkey") % 3 == 0)
        .select("custkey", (F.col("bal") * 1.1).alias("new_bal"))
        .unionByName(
            base.filter(F.col("custkey") % 5 == 0).select(
                (F.col("custkey") + NEW_KEY_OFFSET).alias("custkey"),
                F.col("bal").alias("new_bal"),
            )
        )
    )
    j = (
        base.withColumn("in_base", F.lit(True))
        .join(upd.withColumn("in_upd", F.lit(True)), "custkey", "full_outer")
        .select(
            "custkey",
            "bal",
            "new_bal",
            F.coalesce("in_base", F.lit(False)).alias("in_base"),
            F.coalesce("in_upd", F.lit(False)).alias("in_upd"),
        )
    )
    changed = F.col("in_base") & F.col("in_upd") & (
        F.col("new_bal") != F.col("bal")
    )

    def version(bal_col, vf, vt, cur: bool):
        return F.struct(
            F.round(bal_col, 4).alias("acctbal"),
            vf.alias("valid_from"),
            vt.alias("valid_to"),
            F.lit(cur).alias("is_current"),
        )

    versions = (
        F.when(
            changed,
            F.array(
                version(F.col("bal"), ts0, ts1, False),
                version(F.col("new_bal"), ts1, tnull, True),
            ),
        )
        .when(
            F.col("in_base"),  # untouched, or update carried equal value
            F.array(version(F.col("bal"), ts0, tnull, True)),
        )
        .otherwise(  # insert: key unseen by the base snapshot
            F.array(version(F.col("new_bal"), ts1, tnull, True))
        )
    )
    return j.select("custkey", F.explode(versions).alias("r")).select(
        "custkey", "r.acctbal", "r.valid_from", "r.valid_to", "r.is_current"
    )


_DIFF_ORACLE = f"""
WITH base AS (
  SELECT c_custkey AS custkey, ROUND(c_acctbal, 4) AS bal FROM customer
),
new_snap AS (
  SELECT custkey, ROUND(bal * 1.05, 4) AS bal FROM base
  WHERE custkey % 7 = 0 AND custkey % 11 <> 0
  UNION ALL
  SELECT custkey, bal FROM base
  WHERE custkey % 7 <> 0 AND custkey % 11 <> 0
  UNION ALL
  SELECT custkey + {NEW_KEY_OFFSET}, bal FROM base WHERE custkey % 13 = 0
),
j AS (
  SELECT COALESCE(b.custkey, n.custkey) AS custkey, b.bal AS old_bal,
         n.bal AS new_bal, b.custkey IS NOT NULL AS in_base,
         n.custkey IS NOT NULL AS in_new
  FROM base b FULL OUTER JOIN new_snap n ON b.custkey = n.custkey
)
SELECT custkey,
       CASE WHEN NOT in_base THEN 'insert'
            WHEN NOT in_new THEN 'delete'
            ELSE 'update' END AS change_type,
       old_bal, new_bal
FROM j
WHERE NOT in_base OR NOT in_new OR old_bal <> new_bal
"""


@query("snapshot_diff", oracle=_DIFF_ORACLE)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC extraction: given two versions of a table,
    emit the change stream (insert / delete / update rows with old and
    new values), the building block for incremental downstream refresh
    when the source can't produce a changelog itself. The reference's
    incremental model diffs catalog timestamps to find *stale objects*
    (Stage.scala:249-266); this is the same delta algebra applied at row
    granularity.

    The fixture derives the new snapshot from customer: custkey%11 rows
    deleted, surviving custkey%7 rows get bal*1.05, custkey%13 rows also
    insert under a shifted key. Unchanged rows are filtered out AFTER the
    join, so the diff is one full-outer sort-merge join on the key — both
    sides shuffle once, no window, no driver state; at 100 TB the two
    snapshots co-partition on the key and unchanged rows never leave the
    joined partition.
    """
    base = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.round(F.col("c_acctbal"), 4).alias("bal"),
    )
    survivors = base.filter(F.col("custkey") % 11 != 0)
    new_snap = (
        survivors.filter(F.col("custkey") % 7 == 0)
        .select("custkey", F.round(F.col("bal") * 1.05, 4).alias("bal"))
        .unionByName(survivors.filter(F.col("custkey") % 7 != 0))
        .unionByName(
            base.filter(F.col("custkey") % 13 == 0).select(
                (F.col("custkey") + NEW_KEY_OFFSET).alias("custkey"), "bal"
            )
        )
    )
    j = (
        base.select("custkey", F.col("bal").alias("old_bal"))
        .withColumn("in_base", F.lit(True))
        .join(
            new_snap.select("custkey", F.col("bal").alias("new_bal"))
            .withColumn("in_new", F.lit(True)),
            "custkey",
            "full_outer",
        )
        .select(
            "custkey",
            "old_bal",
            "new_bal",
            F.coalesce("in_base", F.lit(False)).alias("in_base"),
            F.coalesce("in_new", F.lit(False)).alias("in_new"),
        )
    )
    return j.filter(
        ~F.col("in_base") | ~F.col("in_new") | (F.col("old_bal") != F.col("new_bal"))
    ).select(
        "custkey",
        F.when(~F.col("in_base"), F.lit("insert"))
        .when(~F.col("in_new"), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        "old_bal",
        "new_bal",
    )


_PROFILE_COLS = ("o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN(TRY_CAST({c} AS DOUBLE)) AS DOUBLE) AS min_num,
           CAST(MAX(TRY_CAST({c} AS DOUBLE)) AS DOUBLE) AS max_num
    FROM orders
    """
    for c in _PROFILE_COLS
)


@query("table_profile", oracle=_PROFILE_ORACLE)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the ANALYZE TABLE / data-quality-report shape):
    one output row per profiled column with row count, null count,
    distinct count, and numeric min/max (null for non-castable strings).

    All columns profile in ONE scan: the per-column aggregates compute in
    a single agg (Catalyst plans multiple COUNT(DISTINCT)s via a single
    Expand — still one pass over the data), and the wide result row is
    unpivoted driver-free with stack(). At 100 TB swap COUNT(DISTINCT)
    for approx_count_distinct and the same plan holds with no Expand
    blowup; exact is kept here because the oracle must match bit-for-bit.
    """
    # measured: repartitioning the narrow projection before the Expand
    # costs more than the parallelism it buys (the partial aggs collapse
    # to vocabulary-sized state immediately) — unlike the explode ops,
    # profile stays scan-partitioned.
    o = load(spark, sf_dir, "orders").select(*_PROFILE_COLS)
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.expr(f"try_cast({c} AS DOUBLE)")).alias(f"{c}__min"),
            F.max(F.expr(f"try_cast({c} AS DOUBLE)")).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(column_name, n_rows, n_null, n_distinct, min_num, max_num)"
        )
    )
