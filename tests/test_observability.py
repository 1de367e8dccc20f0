"""Pipeline observability via DataFrame.observe / Observation.

A 100 TB curation run needs its keep/drop counts WITHOUT a second pass:
`observe()` attaches metric expressions that accumulate during the one
real execution (driver-collected, exactly-once per action) — the Spark
analog of the reference's RunStatus progress rows (RunStatus.scala:87-115),
but computed inside the job instead of around it.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from dig_aggregator_core_spark.tables import load


def test_observe_metrics_during_single_pass(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    obs = Observation("curation_metrics")
    kept = (
        docs.observe(
            obs,
            F.count(F.lit(1)).alias("n_in"),
            F.sum((F.col("n_chars") >= 100).cast("long")).alias("n_kept"),
            F.sum("n_chars").alias("chars_in"),
        )
        .filter(F.col("n_chars") >= 100)
        .count()
    )
    m = obs.get
    assert m["n_in"] == docs.count()
    assert m["n_kept"] == kept  # metrics agree with the actual output
    assert m["chars_in"] > 0


def test_observe_on_write_action(spark, sf_dir, tmp_path):
    # metrics also accumulate under a write action — the production shape
    # (observe -> sink -> read metrics), no extra scan anywhere
    orders = load(spark, sf_dir, "orders")
    obs = Observation("sink_metrics")
    (
        orders.observe(obs, F.count(F.lit(1)).alias("rows_written"))
        .write.mode("overwrite")
        .parquet(str(tmp_path / "orders_out"))
    )
    assert obs.get["rows_written"] == orders.count()
