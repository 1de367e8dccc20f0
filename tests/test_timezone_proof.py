"""Event-time results must not depend on spark.sql.session.timeZone.

The fixtures store events.ts as naive timestamp[us] (TIMESTAMP_NTZ in
Spark). Every ts-deriving operator goes through the tz-proof helpers in
tables.py (ntz_epoch_us / ntz_as_utc_instant / instant_as_ntz); a plain
``cast(ts as timestamp)`` or ``unix_micros`` would silently shift results
by the session offset. The driver harness builds its OWN session whose
timezone we don't control, so this is a contract, not a style choice.

These tests re-run the ts-deriving queries under a deliberately hostile
session timezone (Kathmandu, +05:45 — catches even whole-hour-offset
assumptions) and compare against the same naive DuckDB oracle.
"""

from __future__ import annotations

import pytest

from dig_aggregator_core_spark import registry
from tests.oracle import compare, duck_con

# Each name here derives output values from the naive ts column (epoch
# arithmetic, windowing, watermarks, session gaps); a tz-dependent bug
# would shift its rows while leaving pure-key queries untouched.
TS_DERIVING = [
    "timeseries_gapfill",
    "sessionize_events",
    "window_time_rolling",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "stream_tumbling_availablenow",
    "stream_stream_interval_join",
    "sample_temporal_split",
    "feature_ols_trend",
    "dq_freshness_audit",
]


@pytest.fixture(scope="module")
def hostile_tz(spark):
    before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", before)


@pytest.mark.parametrize("name", TS_DERIVING)
def test_tz_invariant(hostile_tz, sf_dir, name):
    registry.load_all()
    con = duck_con(sf_dir)
    compare(registry.QUERIES[name](hostile_tz, sf_dir), con, registry.ORACLES[name])
