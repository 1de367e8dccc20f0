"""Object-store surface (VERDICT r9 task 8): s3a conf pass-through and
the scheme-aware lister, exercised with the file:// scheme (the same
Hadoop FileSystem code path as s3a://, zero network)."""

from __future__ import annotations

import os

from dig_aggregator_core_spark.plans.context import local_lister
from dig_aggregator_core_spark.sources.object_store import (
    configure_s3a,
    hadoop_lister,
    lister_for,
)


def test_configure_s3a_sets_hadoop_conf(spark):
    configure_s3a(
        spark,
        endpoint="https://storage.example.internal:9000",
        credentials_provider=(
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        ),
        path_style_access=True,
        extra={"fs.s3a.connection.maximum": "64"},
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == (
        "https://storage.example.internal:9000"
    )
    assert hconf.get("fs.s3a.aws.credentials.provider").endswith(
        "AnonymousAWSCredentialsProvider"
    )
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.connection.maximum") == "64"


def test_hadoop_lister_matches_local_lister(spark, tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "one.json").write_text("{}")
    (tmp_path / "a" / "two.json").write_text("{}")
    (tmp_path / "b").mkdir()
    (tmp_path / "b" / "three.csv").write_text("x")

    local = local_lister(str(tmp_path))
    remote = hadoop_lister(spark, f"file://{tmp_path}")

    lk = [(k, v.replace(microsecond=0)) for k, v in local("")]
    rk = [(k, v.replace(microsecond=0)) for k, v in remote("")]
    assert lk == rk  # same keys, same (second-truncated) mtimes
    assert [k for k, _ in remote("a/")] == ["a/one.json", "a/two.json"]


def test_lister_for_dispatches_on_scheme(spark, tmp_path):
    (tmp_path / "f.txt").write_text("x")
    via_path = lister_for(spark, str(tmp_path))
    via_uri = lister_for(spark, f"file://{tmp_path}")
    assert [k for k, _ in via_path("")] == ["f.txt"]
    assert [k for k, _ in via_uri("")] == ["f.txt"]


def test_hadoop_lister_missing_root_lists_empty(spark, tmp_path):
    """ADVICE r10: drop-in parity — a nonexistent root yields [] on
    BOTH listers (os.walk semantics), not FileNotFoundException."""
    missing = tmp_path / "never_created"
    assert local_lister(str(missing))("") == []
    assert hadoop_lister(spark, f"file://{missing}")("") == []


def test_listers_agree_at_full_precision(spark, tmp_path):
    """ADVICE r10: the local lister truncates to milliseconds to match
    Hadoop's getModificationTime, so swapping listers on an existing
    warehouse cannot shift Input versions. Compare WITHOUT blunting to
    seconds — the pre-fix drift was sub-second."""
    (tmp_path / "x.json").write_text("{}")
    assert local_lister(str(tmp_path))("") == hadoop_lister(
        spark, f"file://{tmp_path}"
    )("")
