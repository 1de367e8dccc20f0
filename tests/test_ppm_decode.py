"""decode_image is a REAL binary-PPM (P6) decoder (r9, VERDICT r8 task
3): pin the netpbm header grammar — whitespace runs, '#' comments between
tokens, the single whitespace byte after maxval — and the raster slice,
against blobs built both by hand and by the Spark-side attach_ppm
builder. A codec library is deliberately NOT involved: P6 is the
uncompressed format that makes the decode path real in this container."""

import hashlib

import pytest

from dig_aggregator_core_spark.operators.multimodal import (
    attach_ppm,
    decode_image,
)


def _blob(w, h, header=None):
    raster = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    head = header if header is not None else f"P6\n{w} {h}\n255\n".encode()
    return head + raster, raster


def test_decode_plain_header():
    blob, raster = _blob(4, 3)
    d = decode_image(blob)
    assert (d["width"], d["height"], d["maxval"]) == (4, 3, 255)
    assert d["pixels"] == raster


def test_decode_comments_and_whitespace_runs():
    # netpbm allows comments between any header tokens and arbitrary
    # whitespace runs (spec: token separators are whitespace, '#' starts
    # a comment to end-of-line)
    head = b"P6 # a comment\n  # another\n 5\t\n# w done\n2   \n255\n"
    blob, raster = _blob(5, 2, header=head)
    d = decode_image(blob)
    assert (d["width"], d["height"]) == (5, 2)
    assert d["pixels"] == raster


def test_decode_rejects_bad_magic_and_truncation():
    blob, _ = _blob(4, 3)
    with pytest.raises(ValueError, match="P6"):
        decode_image(b"P5" + blob[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_image(blob[:-1])
    with pytest.raises(ValueError, match="8-bit"):
        decode_image(b"P6\n2 2\n65535\n" + b"\0" * 12)


def test_decode_raster_may_contain_header_like_bytes():
    # raster bytes that LOOK like header tokens (digits, '#', newlines)
    # must be taken literally — the header ends after maxval's single
    # whitespace byte, full stop
    prefix = b"12 #\n34\x00\xff"
    raster = prefix + bytes(range(4 * 2 * 3 - len(prefix)))
    blob = b"P6\n4 2\n255\n" + raster
    assert decode_image(blob)["pixels"] == raster


def test_attach_ppm_roundtrip_matches_text(spark, sf_dir):
    from dig_aggregator_core_spark.tables import load

    rows = (
        attach_ppm(load(spark, sf_dir, "documents").limit(20))
        .collect()
    )
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").limit(20).collect()
    }
    assert rows
    for r in rows:
        d = decode_image(bytes(r["payload"]))
        w, h = 8 + r["doc_id"] % 8, 6 + r["doc_id"] % 6
        assert (d["width"], d["height"]) == (w, h)
        text = docs[r["doc_id"]].encode()
        expect = (text * (w * h * 3 // len(text) + 1))[: w * h * 3]
        assert d["pixels"] == expect
        # the digest the oracle replays is over exactly these bytes
        assert hashlib.md5(d["pixels"]).hexdigest() == hashlib.md5(
            expect
        ).hexdigest()
