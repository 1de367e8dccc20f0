"""Job-side provenance commit (reference commitRun.py) + stage timing
(reference Util.scala).

The reference ships commitRun.py to the cluster so a JOB can upsert its
own (input, version) -> output rows into the runs ledger mid-run, guarded
by JOB_DRYRUN. Here the same flow goes through JobContext.commit_runs:
a job commits its inputs itself; under --test the call is a no-op; and a
later driver-side insert_runs for the same output upserts (not
duplicates) the rows. Util.time's "<msg> took <N> ms" logging contract
is pinned for time_block, including the log-on-error finally semantics.
"""

from __future__ import annotations


# integration-style tier: excluded from the default fast gate run
# (pytest.ini); the full suite runs with -m "slow or not slow"
import pytest

pytestmark = pytest.mark.slow

from datetime import datetime


from dig_aggregator_core_spark.plans.context import Context
from dig_aggregator_core_spark.plans.inputs import Input, Source
from dig_aggregator_core_spark.plans.opts import Opts
from dig_aggregator_core_spark.plans.outputs import Named
from dig_aggregator_core_spark.plans.stage import Stage
from dig_aggregator_core_spark.plans.util import time_block

T0 = datetime(2026, 1, 1, 0, 0, 0)


class SelfCommitStage(Stage):
    """A stage whose job commits its own provenance (commitRun.py flow)."""

    src = Source("data/*/", "*")
    sources = [src]

    def __init__(self, context):
        super().__init__(context)
        self.committed_in_job: list[str] = []

    def rules(self, input_):
        caps = self.src.captures(input_)
        assert caps is not None
        return Named(caps[0])

    def make(self, output):
        def job(ctx):
            # the job commits the rows it just processed — mirrors the
            # cluster step that invokes commitRun.py with the event JSON
            ctx.commit_runs(
                [Input(f"data/{output}/f1", T0), Input(f"data/{output}/f2", T0)]
            )
            self.committed_in_job.append(output)

        return job


@pytest.fixture()
def context(spark, tmp_path):
    ctx = Context(
        spark=spark,
        project="test",
        method_name="CommitMethod",
        warehouse=str(tmp_path),
        lister=lambda prefix: [
            (f"data/x/f1", T0),
            (f"data/x/f2", T0),
        ],
    )
    ctx.runs.migrate()
    ctx.runstatus.migrate()
    return ctx


def _rows(ctx):
    return {
        (r.output, r.input)
        for r in ctx.runs.of("SelfCommitStage").collect()
    }


def test_job_commits_its_own_runs(context):
    stage = SelfCommitStage(context)
    # no_insert_runs: the driver-side batched commit is OFF, so any ledger
    # row can only have come from the job's own commit_runs call
    stage.run(Opts(yes=True, no_insert_runs=True))
    assert stage.committed_in_job == ["x"]
    assert _rows(context) == {("x", "data/x/f1"), ("x", "data/x/f2")}


def test_job_commit_is_dryrun_guarded(context):
    """JOB_DRYRUN semantics (commitRun.py:76-77): under --test the job
    still runs but its commit is a no-op."""
    stage = SelfCommitStage(context)
    stage.run(Opts(yes=True, test=True, no_insert_runs=True))
    assert stage.committed_in_job == ["x"]
    assert _rows(context) == set()


def test_job_commit_then_driver_insert_runs_upserts(context):
    """The job-side and driver-side commits share the upsert key, so the
    normal end-of-run insert_runs over the same output replaces rather
    than duplicates."""
    stage = SelfCommitStage(context)
    stage.run(Opts(yes=True))  # job commits AND driver insert_runs runs
    assert _rows(context) == {("x", "data/x/f1"), ("x", "data/x/f2")}


def test_commit_runs_without_ledger_raises():
    from dig_aggregator_core_spark.plans.stage import JobContext

    ctx = JobContext(
        spark=None, method="m", stage="s", output="o",
        prefix="out/m/s", dryrun=False,
    )
    with pytest.raises(RuntimeError):
        ctx.commit_runs([Input("k", T0)])


def test_time_block_logs_elapsed():
    msgs: list[str] = []
    with time_block("stage Foo", do_log=msgs.append):
        pass
    assert len(msgs) == 1
    assert msgs[0].startswith("stage Foo took ") and msgs[0].endswith(" ms")


def test_time_block_logs_even_on_error():
    msgs: list[str] = []
    with pytest.raises(ValueError):
        with time_block("boom", do_log=msgs.append):
            raise ValueError("x")
    assert len(msgs) == 1 and msgs[0].startswith("boom took ")
