"""quality_compression_ratio: pin the Spark mapInPandas path against
direct zlib calls (no SQL oracle exists for DEFLATE)."""

import zlib

import pytest

from dig_aggregator_core_spark.registry import QUERIES, load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    load_all()
    df = QUERIES["quality_compression_ratio"](spark, SF)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_exact_bytes_match_direct_zlib(spark, result):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = docs.collect()
    assert len(rows) == len(result)
    for r in rows:
        raw = (r["text"] or "").encode("utf-8")
        exp_comp = len(zlib.compress(raw, 6))
        got = result[r["doc_id"]]
        assert got["n_bytes"] == len(raw)
        assert got["n_compressed"] == exp_comp
        assert got["ratio_micro"] == exp_comp * 1000000 // max(len(raw), 1)


def test_ratio_band_sane(result):
    # natural prose compresses well below 2.0x (tiny docs can EXPAND
    # past 1.0x — deflate header overhead) and above 0.01x — a band
    # violation means the codec path broke
    for v in result.values():
        assert 10_000 <= v["ratio_micro"] <= 2_000_000
