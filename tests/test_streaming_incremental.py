"""The streaming incremental runner: exactly-once file processing across
restarts (checkpoint = the reference's delta anti-join, Stage.scala:249-266)
plus ledger provenance per epoch."""

from __future__ import annotations

import pytest

# integration-style tier: excluded from the default fast gate run
# (pytest.ini); the full suite runs with -m "slow or not slow"
pytestmark = pytest.mark.slow

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dig_aggregator_core_spark.plans.ledger import RunsLedger
from dig_aggregator_core_spark.streaming.incremental import run_incremental

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.DoubleType(), False),
    ]
)


def _write_batch(spark, path: str, name: str, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}")
    # flatten: the file source watches one directory of parquet files
    import glob as g
    import shutil

    (part,) = g.glob(f"{path}/{name}/part-*.parquet")
    shutil.move(part, f"{path}/{name}.parquet")
    shutil.rmtree(f"{path}/{name}")


def test_incremental_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ledger = RunsLedger(spark, str(tmp_path / "runs"), "proj", "meth")
    ledger.migrate()

    def transform(df):
        return df.groupBy("k").agg(F.sum("v").alias("total"))

    _write_batch(spark, src, "b0", [(1, 1.0), (2, 2.0)])
    run_incremental(
        spark,
        source_dir=src,
        schema=SCHEMA,
        transform=transform,
        output_dir=out,
        checkpoint_dir=ckpt,
        ledger=ledger,
        stage="s1",
        output_name="agg",
    )
    first = spark.read.parquet(out).collect()
    assert sorted((r.k, r.total) for r in first) == [(1, 1.0), (2, 2.0)]
    assert len(ledger.all()) == 1  # one source file committed

    # second pass with NO new files: nothing reprocessed, nothing appended
    run_incremental(
        spark,
        source_dir=src,
        schema=SCHEMA,
        transform=transform,
        output_dir=out,
        checkpoint_dir=ckpt,
        ledger=ledger,
        stage="s1",
        output_name="agg",
    )
    assert len(spark.read.parquet(out).collect()) == 2

    # a new file arrives: ONLY it is processed (incremental delta)
    _write_batch(spark, src, "b1", [(1, 10.0)])
    run_incremental(
        spark,
        source_dir=src,
        schema=SCHEMA,
        transform=transform,
        output_dir=out,
        checkpoint_dir=ckpt,
        ledger=ledger,
        stage="s1",
        output_name="agg",
    )
    rows = sorted(
        (r.k, r.total) for r in spark.read.parquet(out).collect()
    )
    # b0's aggregate plus b1's aggregate appended — b0 NOT recomputed
    assert rows == [(1, 1.0), (1, 10.0), (2, 2.0)]
    assert len(ledger.all()) == 2  # provenance for both files
    inputs = sorted(r["input"] for r in ledger.all())
    assert inputs[0].endswith("b0.parquet") and inputs[1].endswith("b1.parquet")
