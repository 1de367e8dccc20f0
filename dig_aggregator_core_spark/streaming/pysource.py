"""Custom STREAMING connector via the Python DataSource stream API
(Spark 4, `SimpleDataSourceStreamReader`): the streaming sibling of
operators/scans.py:scan_python_datasource. A user-defined source tracks
its own offset, hands Spark one chunk per micro-batch, and participates
in the offset log / exactly-once machinery like any built-in source —
the way an in-house queue or poll-based API lands in Structured
Streaming without a JVM connector.

The deterministic generator stands in for the external system: offsets
are row indices, `read(start)` returns the next chunk and the advanced
offset, and `commit` is where a real connector would ack its upstream.
Verified by tests/test_python_stream_source.py: every row arrives
exactly once across micro-batches and the value stream matches the
closed form.

Scale: the simple-reader API executes `read` on the DRIVER and ships
rows through Arrow — right for control-plane-sized feeds (queues, APIs,
change logs); a partition-parallel feed belongs on the full
DataSourceStreamReader with `partitions()`, exactly like the batch
connector's shard enumeration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_synth_stream(spark: SparkSession) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class SynthStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.total = int(options.get("rows", "100"))
            self.chunk = int(options.get("chunk", "25"))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            end = min(pos + self.chunk, self.total)
            rows = [
                (rid, (rid * 7919 % 1000) / 1000.0)
                for rid in range(pos, end)
            ]
            return iter(rows), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return iter(
                (rid, (rid * 7919 % 1000) / 1000.0)
                for rid in range(start["pos"], end["pos"])
            )

        def commit(self, end):
            pass  # a real connector acks its upstream here

    class SynthStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "synth_stream"

        def schema(self):
            return "rid bigint, score double"

        def simpleStreamReader(self, schema):
            return SynthStreamReader(self.options)

    spark.dataSource.register(SynthStreamSource)


def synth_stream(
    spark: SparkSession, rows: int = 100, chunk: int = 25
) -> DataFrame:
    """Streaming DataFrame over the registered synthetic feed."""
    register_synth_stream(spark)
    return (
        spark.readStream.format("synth_stream")
        .option("rows", str(rows))
        .option("chunk", str(chunk))
        .load()
    )
