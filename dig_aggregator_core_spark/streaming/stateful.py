"""Stateful streaming operators (SURVEY.md §2.9 GAP rows): streaming
deduplication and a custom per-key stateful aggregate via
``applyInPandasWithState``.

The reference has no streaming engine; these are the native-Spark
capabilities its batch-incremental model implies. Both run as REAL
Structured Streaming queries (file source → Trigger.AvailableNow → memory
sink) so the state-store code path is exercised, and both produce
deterministic results equal to a batch SQL oracle.

Scale: dedup state and per-user state are partitioned by key across the
state store; watermarks bound dedup state retention. At 100 TB the same
plan runs continuously with a real watermark-driven eviction.
"""

from __future__ import annotations

import itertools
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query

_sink_counter = itertools.count()


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet (nanos ts handled as in
    tables.load)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def _run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    sink = f"stateful_sink_{next(_sink_counter)}"
    spark = df.sparkSession
    # The first micro-batch pins state-store partitioning into the
    # checkpoint, so choose it deliberately: state for this fixture is tiny
    # and 200 state partitions would be pure per-partition overhead. At real
    # scale this is the knob sized to state volume, not data volume.
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    return spark.table(sink)


@query(
    "stream_dedup_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: dropDuplicates on (user_id, event_type) with
    a watermark bounding dedup state. Emitting only the key columns makes
    the kept-row choice irrelevant — the result is exactly the distinct key
    set, which the batch oracle pins."""
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "30 days")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(deduped, "append")


_USER_STATS_OUT = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_USER_STATS_STATE = "n bigint, total double, mx double"


def _user_stats_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum, max) of `value` per user across micro-batches
    — the applyInPandasWithState analog of the reference payload's
    aggregateByKey combine (frequencyAnalysis.py:54-75), here with explicit
    cross-batch state."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        vals = pdf["value"]
        n += int(vals.count())
        total += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "max_value": [mx],
        }
    )


@query(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS total_value,
           MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (count, sum, max) over the event stream. State lives in the state store
    partitioned by user_id; each trigger emits the updated running totals.
    Under AvailableNow over a static source the final emission per user
    equals the batch aggregate, which the oracle checks exactly."""
    stream = _events_stream(spark, sf_dir)
    stats = stream.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType=_USER_STATS_OUT,
        stateStructType=_USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(stats, "update")


@query(
    "stream_stream_interval_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS user_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    clicks joined to same-user purchases within the following 6 hours.
    Both sides carry watermarks so the join state is bounded — Spark GCs a
    buffered click once the purchase watermark passes click.ts + 6h. Inner
    join emissions are invariant to micro-batch boundaries, so the result
    equals the batch interval join, which the oracle pins."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 day")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 day")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 6 HOURS")
        ),
    ).select("click_id", "purchase_id", "user_id")
    return _run_to_memory(joined, "append")
