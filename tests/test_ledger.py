"""Ports of RunsTest.scala and RunsStatusTest.scala against the
Parquet-backed ledgers, including the upsert-on-conflict semantics and the
RunStatus started/ended reset."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from dig_aggregator_core_spark.plans.inputs import Input
from dig_aggregator_core_spark.plans.ledger import RunsLedger, RunStatusLedger

T0 = datetime(2026, 1, 1, 0, 0, 0)


def inp(name: str, offset_s: int = 0) -> Input:
    return Input(name, T0 + timedelta(seconds=offset_s))


@pytest.fixture()
def runs(spark, tmp_path):
    return RunsLedger(spark, str(tmp_path / "runs"), "test", "TestMethod")


@pytest.fixture()
def status(spark, tmp_path):
    return RunStatusLedger(spark, str(tmp_path / "runstatus"), "test", "TestMethod")


# --- RunsTest.scala ---


def test_runs_migrate(runs):
    runs.migrate()
    assert runs.all() == []
    runs.migrate()  # idempotent
    assert runs.all() == []


def test_runs_insert_delete_single(runs):
    runs.migrate()
    runs.insert("TestStage", "o1", [inp("i1")])
    assert len(runs.all()) == 1
    assert runs.delete("TestStage", "o1") == 1
    assert runs.all() == []


def test_runs_insert_delete_multiple(runs):
    inputs = [inp(str(n), n) for n in range(1, 7)]
    runs.migrate()
    runs.insert("TestStage", "o1", inputs[:3])
    runs.insert("TestStage", "o2", inputs[3:])

    results = runs.of("TestStage").collect()
    assert len(results) == 6
    i1 = {(r.input, r.version) for r in results if r.output == "o1"}
    i2 = {(r.input, r.version) for r in results if r.output == "o2"}
    assert i1 == {(i.key, i.version) for i in inputs[:3]}
    assert i2 == {(i.key, i.version) for i in inputs[3:]}

    runs.delete("TestStage", "o1")
    runs.delete("TestStage", "o2")
    assert runs.all() == []


def test_runs_upsert_same_key_new_version(runs):
    """RunsTest 'update output with changed inputs': re-inserting the same
    (input, output) key with a new version REPLACES the row."""
    inputs = [inp(str(n), n) for n in range(1, 4)]
    runs.migrate()
    runs.insert("TestStage", "o", inputs)
    assert {(r.input, r.version) for r in runs.all()} == {
        (i.key, i.version) for i in inputs
    }

    new_inputs = [inp(str(n), n) for n in range(4, 7)]
    runs.insert("TestStage", "o", new_inputs)
    assert {(r.input, r.version) for r in runs.all()} == {
        (i.key, i.version) for i in inputs + new_inputs
    }

    updated = [inp(i.key, 100) for i in inputs]  # same keys, newer versions
    runs.insert("TestStage", "o", updated)
    assert {(r.input, r.version) for r in runs.all()} == {
        (i.key, i.version) for i in new_inputs + updated
    }
    assert len(runs.all()) == 6  # upsert, not append

    runs.delete("TestStage", "o")
    assert runs.all() == []


def test_runs_scoped_to_project_method_stage(runs, spark, tmp_path):
    runs.migrate()
    runs.insert("TestStage", "o1", [inp("i1")])
    other = RunsLedger(spark, str(tmp_path / "runs"), "test", "TestMethod")
    assert other.of("OtherStage").count() == 0
    assert other.of("TestStage").count() == 1


# --- RunsStatusTest.scala ---


def test_status_migrate(status):
    status.migrate()
    assert status.all() == []


def test_status_insert_delete(status):
    status.migrate()
    status.insert("TestStage", "o1")
    assert len(status.all()) == 1
    status.delete("TestStage", "o1")
    assert status.all() == []

    status.insert("TestStage", "o1")
    status.insert("TestStage", "o2")
    results = status.of("TestStage").collect()
    assert len(results) == 2
    assert len([r for r in results if r.output == "o1"]) == 1
    assert len([r for r in results if r.output == "o2"]) == 1
    status.delete("TestStage", "o1")
    status.delete("TestStage", "o2")
    assert status.all() == []


def test_status_lifecycle_and_reset(status):
    """RunsStatusTest 'update output, removing start / end': re-insert of
    the same key blanks started/ended (RunStatus.scala:79-83)."""
    status.migrate()
    status.insert("TestStage", "o")
    (row,) = status.of("TestStage").collect()
    assert row.started is None and row.ended is None

    status.start("TestStage", "o")
    (row,) = status.of("TestStage").collect()
    assert row.started is not None and row.ended is None

    status.end("TestStage", "o")
    (row,) = status.of("TestStage").collect()
    assert row.started is not None and row.ended is not None

    status.insert("TestStage", "o")  # re-insert resets
    (row,) = status.of("TestStage").collect()
    assert row.started is None and row.ended is None
    assert len(status.all()) == 1

    status.delete("TestStage", "o")
    assert status.all() == []
