"""SparkSession factory tuned for the engine.

The reference delegates sizing to EMR ``maximizeResourceAllocation``
(reference Stage.scala:36-38); our equivalent is a conf block designed for
scale-out: AQE on (runtime coalescing, skew-join splitting, dynamic BHJ
conversion), UTC session timezone (reference pins UTC at Implicits.scala:16),
and Arrow for any pandas exchange.

`shuffle_partitions` should be sized to the data: ~128 MB per task post-shuffle.
On the local test harness 32 matches local[32]; on a 1000-executor cluster the
caller passes cores*2..3 and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims (region/nation/supplier/metadata) are small; let Catalyst BHJ them
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # ~128MB input splits: good parallelism without tiny-file overhead
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.ui.enabled": "false",
    # local[N] runs driver + all executor threads in ONE JVM; Spark's 1g
    # default heap is sized for a thin cluster driver, not 32 concurrent
    # task threads plus persisted intermediates (a long query sequence
    # OOMs it). Applies only when this factory launches the JVM — a
    # caller's pre-existing session keeps its own sizing. Env-overridable
    # for smaller hosts.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(
    app_name: str = "dig-aggregator-core-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
