"""Loaders for the driver-generated test tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
