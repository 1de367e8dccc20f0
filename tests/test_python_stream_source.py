"""The Python streaming DataSource (streaming/pysource.py) must deliver
every row exactly once across micro-batches, with offsets advancing
chunk-by-chunk through the offset log."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from dig_aggregator_core_spark.streaming.pysource import synth_stream


def test_python_stream_source_exactly_once(spark):
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_scratch", "pysource"
    )
    shutil.rmtree(base, ignore_errors=True)
    rows, chunk = 100, 25
    emitted: list = []

    def sink(batch, epoch_id):
        emitted.extend(batch.collect())

    # availableNow snapshots only the first prefetched chunk of a simple
    # stream reader, so run the query live and stop once the feed drains
    q = (
        synth_stream(spark, rows=rows, chunk=chunk)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "chk"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while len(emitted) < rows and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    got = sorted((r["rid"], r["score"]) for r in emitted)
    expected = [
        (rid, (rid * 7919 % 1000) / 1000.0) for rid in range(rows)
    ]
    assert got == expected  # every row exactly once, closed form matches
