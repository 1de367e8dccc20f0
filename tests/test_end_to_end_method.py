"""Layers A+B together, end to end: the reference's whole operating model —
a Method whose stage discovers partitioned JSON inputs on disk (the
`variants/<ancestry>/<dataset>/part-*` + `metadata` layout of
frequencyAnalysis.py:24,109), routes them by glob capture, runs the REAL
frequency pipeline per ancestry, commits provenance, and on re-run computes
only the delta when a new dataset lands."""

from __future__ import annotations

import pytest

# integration-style tier: excluded from the default fast gate run
# (pytest.ini); the full suite runs with -m "slow or not slow"
pytestmark = pytest.mark.slow

import json
import os
import time

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators.frequency import calc_freq
from dig_aggregator_core_spark.plans.context import Context, local_lister
from dig_aggregator_core_spark.plans.inputs import Source
from dig_aggregator_core_spark.plans.opts import Opts
from dig_aggregator_core_spark.plans.outputs import ALL, Named
from dig_aggregator_core_spark.plans.stage import Stage

VARIANTS_SCHEMA = (
    "varId string, dataset string, ancestry string, eaf double, maf double"
)
META_SCHEMA = "name string, samples double"


def write_dataset(root: str, ancestry: str, dataset: str, rows, samples):
    d = os.path.join(root, "variants", ancestry, dataset)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-00000.json"), "w") as fh:
        for var_id, eaf, maf in rows:
            fh.write(
                json.dumps(
                    {
                        "varId": var_id,
                        "dataset": dataset,
                        "ancestry": ancestry,
                        "eaf": eaf,
                        "maf": maf,
                    }
                )
                + "\n"
            )
    with open(os.path.join(d, "metadata"), "w") as fh:
        fh.write(json.dumps({"name": dataset, "samples": samples}) + "\n")


class FrequencyStage(Stage):
    """The reference's frequencyanalysis stage: part files route to their
    ancestry's output; metadata files contribute to every output
    (dataset max-N feeds all ancestries — Input.scala factories + ALL)."""

    part_src = Source("variants/*/*/", "part-*")
    meta_src = Source("variants/*/*/", "metadata")
    sources = [part_src, meta_src]

    def __init__(self, context, data_root: str, out_root: str):
        super().__init__(context)
        self.data_root = data_root
        self.out_root = out_root
        self.jobs_run: list[str] = []

    def rules(self, input_):
        if input_.basename == "metadata":
            return ALL
        caps = self.part_src.captures(input_)
        assert caps is not None
        return Named(caps[0])  # first '*' = ancestry

    def make(self, output):
        def job(ctx):
            spark = ctx.spark
            self.jobs_run.append(output)
            variants = (
                spark.read.schema(VARIANTS_SCHEMA)
                .json(f"{self.data_root}/variants/*/*/part-*")
                .withColumnRenamed("varId", "var_id")
            )
            weights = (
                spark.read.schema(META_SCHEMA)
                .json(f"{self.data_root}/variants/*/*/metadata")
                .select(
                    F.col("name").alias("dataset"),
                    F.col("samples").alias("w"),
                )
                .groupBy("dataset")
                .agg(F.max("w").alias("n"))
            )
            result = calc_freq(variants, weights, output)
            result.write.mode("overwrite").json(f"{self.out_root}/{output}")

        return job


def read_result(spark, path):
    rows = spark.read.json(path).collect()
    return {r.var_id: (r.eaf, r.maf) for r in rows}


def test_method_end_to_end_incremental(spark, tmp_path):
    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    # two ancestries, two datasets each; weights differ per dataset
    write_dataset(data, "AFR", "d1", [("v1", 0.1, 1.0), ("v2", 0.2, 2.0)], 10.0)
    write_dataset(data, "AFR", "d2", [("v1", 0.3, 3.0)], 30.0)
    write_dataset(data, "EUR", "d1", [("v3", 0.5, 5.0)], 10.0)

    ctx = Context(
        spark=spark,
        project="itest",
        method_name="FrequencyMethod",
        warehouse=str(tmp_path / "wh"),
        lister=local_lister(data),
    )
    ctx.runs.migrate()
    ctx.runstatus.migrate()
    stage = FrequencyStage(ctx, data, out)

    stage.run(Opts(yes=True))
    assert sorted(stage.jobs_run) == ["AFR", "EUR"]

    afr = read_result(spark, f"{out}/AFR")
    # v1: eaf = (0.1*10 + 0.3*30) / 40 = 0.25 ; maf = (1*10 + 3*30) / 40 = 2.5
    assert afr["v1"] == (0.25, 2.5)
    # v2 only in d1: weighted avg = itself
    assert afr["v2"] == (0.2, 2.0)
    assert read_result(spark, f"{out}/EUR") == {"v3": (0.5, 5.0)}

    # ledger: one row per (output, input) pair; metadata rides in EVERY output
    runs = ctx.runs.of("FrequencyStage").collect()
    by_out = {}
    for r in runs:
        by_out.setdefault(r.output, set()).add(r.input)
    assert by_out["AFR"] == {
        "variants/AFR/d1/part-00000.json",
        "variants/AFR/d2/part-00000.json",
        "variants/AFR/d1/metadata",
        "variants/AFR/d2/metadata",
        "variants/EUR/d1/metadata",
    }

    # immediate re-run: everything fresh, zero jobs
    stage.jobs_run.clear()
    stage.run(Opts(yes=True))
    assert stage.jobs_run == []

    # a NEW dataset lands for AFR only (newer mtime than the commit)
    time.sleep(1.1)
    write_dataset(data, "AFR", "d3", [("v1", 0.7, 7.0)], 40.0)
    stage.jobs_run.clear()
    stage.run(Opts(yes=True))
    # the metadata file is ALL-routed, so EUR re-runs too — exactly the
    # reference's semantics (new dataset weights can shift every ancestry)
    assert sorted(stage.jobs_run) == ["AFR", "EUR"]

    afr = read_result(spark, f"{out}/AFR")
    # v1 now: eaf = (0.1*10 + 0.3*30 + 0.7*40) / 80 = 0.475
    assert afr["v1"] == (0.475, 4.75)

    # and a THIRD run with nothing new: quiescent again
    stage.jobs_run.clear()
    stage.run(Opts(yes=True))
    assert stage.jobs_run == []
