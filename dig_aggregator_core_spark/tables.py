"""Loaders for the driver-generated test tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def ntz_epoch_us(col: str) -> F.Column:
    """Epoch microseconds for a naive (TIMESTAMP_NTZ) column, tz-proof.

    The fixtures' parquet stores ts as timestamp[us] with isAdjustedToUTC
    unset, which Spark reads as TIMESTAMP_NTZ; ``unix_micros`` rejects NTZ
    and a cast to TIMESTAMP would shift by the session timezone. Diffing
    against an NTZ epoch literal is pure naive arithmetic and matches
    DuckDB's ``epoch_us`` on the same values.
    """
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {col})")


def ntz_as_utc_instant(col: str) -> F.Column:
    """TIMESTAMP (instant) whose UTC wall-clock equals the naive value.

    Event-time watermarks require TIMESTAMP, not TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); treating the naive value as UTC
    is the only session-timezone-independent embedding. Invert with
    :func:`instant_as_ntz` before emitting results so oracles compare
    against the same naive values.
    """
    return F.timestamp_micros(ntz_epoch_us(col))


def instant_as_ntz(col: str) -> F.Column:
    """Inverse of :func:`ntz_as_utc_instant` (instant's UTC wall-clock as
    TIMESTAMP_NTZ), tz-proof: unix_micros on TIMESTAMP is epoch arithmetic
    and timestampadd onto an NTZ literal is naive arithmetic."""
    return F.expr(f"timestampadd(MICROSECOND, unix_micros({col}), {_EPOCH_NTZ})")


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — filter/column pruning push down into the scan.

    `events.ts` is written as TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as long nanos (legacy conf) and convert to a
    microsecond timestamp column-side (floor division — matches DuckDB's
    ns->us truncation).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
