"""Incremental MinHash band index (r9, VERDICT r8 task 4a): build-once
discipline, O(batch) append maintenance, and the contract that an
appended batch is findable by the NEXT batch's band join."""

import os

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators import dedup


def test_index_builds_once(spark, sf_dir):
    p1 = dedup._band_index_path(spark, sf_dir)
    assert os.path.exists(os.path.join(os.path.dirname(p1), "_done"))
    # second call: same path, no rebuild (the _done short-circuit)
    done_mtime = os.stat(os.path.join(os.path.dirname(p1), "_done")).st_mtime_ns
    p2 = dedup._band_index_path(spark, sf_dir)
    assert p2 == p1
    assert (
        os.stat(os.path.join(os.path.dirname(p1), "_done")).st_mtime_ns
        == done_mtime
    )


def test_index_matches_committed_bands(spark, sf_dir):
    idx = spark.read.parquet(dedup._band_index_path(spark, sf_dir))
    committed = dedup._bands_of(
        dedup._shingled(spark, sf_dir).filter(
            F.col("doc_id") < dedup.MUT_OFFSET
        )
    )
    assert idx.count() == committed.count()
    assert idx.select("band").distinct().count() == dedup._N_BANDS
    # every committed band row round-trips through the parquet index
    assert (
        committed.join(
            idx, ["doc_id", "band", "band_key"], "left_anti"
        ).count()
        == 0
    )


def test_incremental_query_matches_mutated_twins(spark, sf_dir):
    out = dedup.dedup_incremental_minhash(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["doc_new"] >= dedup.MUT_OFFSET
        assert r["doc_seen"] < dedup.MUT_OFFSET
        assert r["jaccard"] >= 0.5
    # the 80%-prefix twin of every base doc must be recalled against its
    # own base (band collision probability is ~1 at this overlap)
    self_pairs = {
        (r["doc_new"], r["doc_seen"])
        for r in rows
        if r["doc_new"] - dedup.MUT_OFFSET == r["doc_seen"]
    }
    assert len(self_pairs) > 0


def test_append_maintenance_makes_batch_findable(spark, sf_dir, tmp_path):
    """The incremental contract end-to-end on a scratch copy of the
    index: append batch-1 bands, then batch-2's band join against the
    MAINTAINED index finds a batch-1 near-dup without any committed
    partition rewrite."""
    src = spark.read.parquet(dedup._band_index_path(spark, sf_dir))
    idx_path = str(tmp_path / "index.parquet")
    src.write.partitionBy("band").parquet(idx_path)

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch1 = spark.createDataFrame(
        [(90_000_001, text)], "doc_id bigint, text string"
    )
    batch2 = spark.createDataFrame(
        [(90_000_002, text)], "doc_id bigint, text string"
    )

    def bands(df):
        sh = df.select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(0, size(split(text,' ')) - 3),"
                " i -> concat_ws(' ', split(text,' ')[i],"
                " split(text,' ')[i+1], split(text,' ')[i+2])))"
            ).alias("sh_set"),
        )
        return dedup._bands_of(sh)

    before = spark.read.parquet(idx_path).count()
    dedup.append_band_index(spark, idx_path, bands(batch1))
    after = spark.read.parquet(idx_path)
    assert after.count() == before + dedup._N_BANDS

    hits = (
        bands(batch2)
        .alias("a")
        .join(
            after.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(F.col("b.doc_id") == 90_000_001)
        .count()
    )
    assert hits == dedup._N_BANDS  # identical text -> all four bands hit
