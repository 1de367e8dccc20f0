"""The Spark-4 transformWithStateInPandas operator is capability-gated:
its Python driver worker requires google.protobuf, which this environment
does not bundle. The test runs the real operator when protobuf is present
and skips (not fakes) when it isn't — the Spark-side plumbing (processor
class, state schema, RocksDB provider config, update-mode run) is still
import-checked either way."""

from __future__ import annotations

import pytest

from dig_aggregator_core_spark.streaming import stateful


def test_gate_is_import_based():
    assert isinstance(stateful._protobuf_available(), bool)
    # the operator must exist and be callable regardless of the gate
    assert callable(stateful.stream_transform_with_state)


@pytest.mark.skipif(
    not stateful._protobuf_available(),
    reason="google.protobuf not bundled; transformWithState worker needs it",
)
def test_transform_with_state_matches_batch(spark, sf_dir):
    out = stateful.stream_transform_with_state(spark, sf_dir)
    from pyspark.sql import functions as F

    from dig_aggregator_core_spark.tables import load

    expected = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("value").cast("double"), 4).alias("max_value"),
        )
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want
