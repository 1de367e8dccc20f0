"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decode/feature-extraction as Arrow-batched Pandas UDFs.

The decode path is REAL (since r9): `decode_image` is a complete
pure-Python decoder for binary PPM (P6) — an uncompressed raster format
that needs no codec library — and `mm_decode_features` drives it
end-to-end over genuine P6 blobs built Spark-side (header + RGB raster),
extracting actual pixel statistics and an md5 raster digest that the
DuckDB oracle replays byte-for-byte. Compressed formats (JPEG/PNG/MP4)
still need a codec library absent from this container; they would slot
into the same `decode_image` hook and mapInPandas plumbing. The synthetic
'FAKE'/'FAKA'/'FAKV' headers remain for the byte-plumbing ops
(mm_binary_meta, mm_frame_sample, mm_modality_dispatch), where the point
is header parsing and frame slicing, not rasters.

Scale: binary payloads ride in the row (parquet binary column); feature
extraction is mapInPandas so payload bytes never round-trip through the JVM
row format one cell at a time — Arrow moves whole batches.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

MAGIC = b"FAKE"


def decode_image(payload: bytes) -> dict:
    """Real image decode: binary PPM (P6), the uncompressed RGB raster
    format (netpbm spec) — full header grammar (whitespace runs and
    '#' comments between tokens, single whitespace byte after maxval),
    8-bit samples, w*h*3-byte raster. Pure Python by design: P6 needs no
    codec library, so the decode path is real in this container.
    Returns {width, height, maxval, pixels: bytes}."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("bad PPM header token")
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if not 0 < maxval < 256:
        raise ValueError("only 8-bit PPM supported")
    pos += 1  # exactly one whitespace byte after maxval, per spec
    raster = payload[pos : pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("truncated raster")
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "pixels": raster,
    }


def fake_decode(payload: bytes) -> dict:
    """Deterministic decoder for the synthetic header:
    4-byte magic 'FAKE' + uint16 width + uint16 height + body."""
    if payload[:4] != MAGIC:
        raise ValueError("bad magic")
    width, height = struct.unpack(">HH", payload[4:8])
    return {"width": width, "height": height, "body_len": len(payload) - 8}


def attach_binary(docs: DataFrame) -> DataFrame:
    """Wrap each document as a fake media object: binary payload with a
    parseable header + a typed metadata struct — the canonical multimodal
    row shape (payload: binary, meta: struct<fmt,width,height>)."""
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(MAGIC),
            # big-endian uint16 width/height derived from doc stats
            F.expr(
                "unhex(concat("
                " lpad(hex(CAST(n_chars % 640 AS INT)), 4, '0'),"
                " lpad(hex(CAST(length(text) % 480 AS INT)), 4, '0')))"
            ),
            F.encode(F.col("text"), "UTF-8"),
        ).alias("payload"),
        F.struct(
            F.lit("fake/v1").alias("fmt"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.length("text") % 480).cast("int").alias("height"),
        ).alias("meta"),
    )


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(8 + octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(n_chars % 640 AS INT) AS width,
           CAST(length(text) % 480 AS INT) AS height,
           'fake/v1' AS fmt
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary attach + metadata projection: the payload is real bytes
    (header + utf-8 body); the oracle checks byte accounting and header
    fields end-to-end."""
    return attach_binary(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("byte_len"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.fmt").alias("fmt"),
    )


def attach_ppm(docs: DataFrame) -> DataFrame:
    """Build a GENUINE binary-PPM (P6) blob per document: ASCII header
    'P6\\n{w} {h}\\n255\\n' followed by a w*h*3-byte RGB raster whose
    bytes are the document text cycled to length (the corpus is pure
    ASCII, so text chars ARE the raster bytes — which is what lets the
    DuckDB oracle reconstruct the identical raster). Dimensions derive
    from doc_id (w in 8..15, h in 6..11), so rasters stay 144–495 bytes:
    fixture-sized images, real format."""
    w = (F.lit(8) + F.col("doc_id") % 8).cast("int")
    h = (F.lit(6) + F.col("doc_id") % 6).cast("int")
    return docs.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("P6\n"),
                w.cast("string"),
                F.lit(" "),
                h.cast("string"),
                F.lit("\n255\n"),
                F.expr(
                    "substring(repeat(text, CAST(ceil((((8 + doc_id % 8)"
                    " * (6 + doc_id % 6) * 3) * 1.0) / length(text)) AS"
                    " INT) + 1), 1, CAST((8 + doc_id % 8) * (6 + doc_id"
                    " % 6) * 3 AS INT))"
                ),
            ),
            "UTF-8",
        ).alias("payload"),
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_image(bytes(payload))  # REAL P6 decode
            px = d["pixels"]
            rows.append(
                (
                    doc_id,
                    d["width"],
                    d["height"],
                    d["width"] * d["height"],
                    float(sum(px)) / len(px),
                    hashlib.md5(px).hexdigest(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "n_pixels", "mean_byte",
                "pixel_md5",
            ],
        )


@query(
    "mm_decode_features",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             8 + CAST(doc_id % 8 AS INT) AS w,
             6 + CAST(doc_id % 6 AS INT) AS h,
             substring(repeat(text,
                 CAST(ceil((((8 + doc_id % 8) * (6 + doc_id % 6) * 3)
                      * 1.0) / length(text)) AS INT) + 1),
               1, CAST((8 + doc_id % 8) * (6 + doc_id % 6) * 3 AS INT))
               AS raster
      FROM documents
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           ROUND(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, w * h * 3 + 1),
                   i -> CAST(ascii(substring(raster, CAST(i AS INT), 1))
                        AS BIGINT))),
                 (acc, c) -> acc + c) AS DOUBLE) / (w * h * 3), 6)
             AS mean_byte,
           md5(raster) AS pixel_md5
    FROM px
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + feature extraction through mapInPandas (Arrow
    batches): each row carries a genuine binary-PPM (P6) blob built by
    attach_ppm; `decode_image` parses the actual netpbm header grammar
    and raster, and the features are real pixel statistics — mean sample
    value and an md5 digest OF THE DECODED RASTER. The oracle
    reconstructs the identical raster from the source text (ASCII corpus:
    chars == bytes) and replays both, so a wrong header parse, a
    truncated raster, or an off-by-one in the pixel slice all
    hash-mismatch. No codec stub remains on this path (r9; compressed
    formats would slot into the same decode_image hook).

    Exactness: mean_byte is an integer sum divided by n = w*h*3 — both
    engines divide identical integer-valued doubles, and no 6-decimal
    tie is reachable (a tie needs 2^7 | n, but n = w*h*3 with w <= 15,
    h <= 11 caps the power of two below 128).

    Scale: blobs are built per-row with codegen expressions and decoded
    in Arrow batches; nothing shuffles. At 100 TB the pattern is
    scan -> mapInPandas decode -> features, embarrassingly parallel."""
    docs = attach_ppm(load(spark, sf_dir, "documents"))
    out = docs.select("doc_id", "payload").mapInPandas(
        _decode_batches,
        schema=(
            "doc_id long, width int, height int, n_pixels long,"
            " mean_byte double, pixel_md5 string"
        ),
    )
    return out.withColumn("mean_byte", F.round("mean_byte", 6))


_FRAME = 16  # bytes per fake "frame"
_STRIDE = 4  # keep every 4th frame


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            d = fake_decode(bytes(payload))
            body = bytes(payload)[8:]
            n_frames = (len(body) + _FRAME - 1) // _FRAME
            sampled = range(0, n_frames, _STRIDE)
            checksum = sum(
                sum(body[f * _FRAME : (f + 1) * _FRAME]) for f in sampled
            )
            rows.append(
                (
                    doc_id,
                    n_frames,
                    len(list(sampled)),
                    checksum,
                    # "resize": halve the decoded dims (stand-in for a real
                    # pixel resample — the codec hook is the only stub)
                    d["width"] // 2,
                    d["height"] // 2,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_frames",
                "n_sampled",
                "checksum",
                "half_width",
                "half_height",
            ],
        )


@query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST((octet_length(encode(text)) + {_FRAME - 1}) // {_FRAME}
                AS BIGINT) AS n_frames,
           CAST(((octet_length(encode(text)) + {_FRAME - 1}) // {_FRAME}
                 + {_STRIDE - 1}) // {_STRIDE} AS BIGINT) AS n_sampled,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(text) + 1),
                  i -> CASE WHEN ((i - 1) // {_FRAME}) % {_STRIDE} = 0
                       THEN CAST(ascii(substring(text, CAST(i AS INT), 1))
                                 AS BIGINT)
                       ELSE CAST(0 AS BIGINT) END)),
                (acc, c) -> acc + c) AS BIGINT) AS checksum,
           CAST((n_chars % 640) // 2 AS INT) AS half_width,
           CAST((length(text) % 480) // 2 AS INT) AS half_height
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling + resize over the binary payload via mapInPandas:
    the body is treated as fixed-size frames, every `_STRIDE`-th frame kept
    (checksummed so the oracle verifies exactly WHICH bytes were sampled),
    and decoded dimensions halved. The Arrow batch shape and per-frame
    slicing are the real video-pipeline plumbing; only the codec is a stub.
    """
    docs = attach_binary(load(spark, sf_dir, "documents"))
    return docs.select("doc_id", "payload").mapInPandas(
        _frame_sample_batches,
        schema=(
            "doc_id long, n_frames long, n_sampled long, checksum long,"
            " half_width int, half_height int"
        ),
    )


MAGIC_AUDIO = b"FAKA"
MAGIC_VIDEO = b"FAKV"


def attach_mixed_modality(docs: DataFrame) -> DataFrame:
    """Mixed-modality corpus: each doc becomes an image (doc_id%3=0,
    'FAKE' header), audio clip (=1, 'FAKA' + uint32 sample count) or
    video (=2, 'FAKV' + uint16 frames + uint16 fps) — one binary column
    whose FORMAT varies row to row, the shape a real multimodal lakehouse
    table has."""
    image = F.concat(
        F.lit(MAGIC),
        F.expr(
            "unhex(concat(lpad(hex(CAST(n_chars % 640 AS INT)), 4, '0'),"
            " lpad(hex(CAST(length(text) % 480 AS INT)), 4, '0')))"
        ),
        F.encode(F.col("text"), "UTF-8"),
    )
    audio = F.concat(
        F.lit(MAGIC_AUDIO),
        F.expr(
            "unhex(lpad(hex(CAST(n_chars * 10 AS BIGINT)), 8, '0'))"
        ),
        F.encode(F.col("text"), "UTF-8"),
    )
    video = F.concat(
        F.lit(MAGIC_VIDEO),
        F.expr(
            "unhex(concat(lpad(hex(CAST(n_chars % 100 AS INT)), 4, '0'),"
            " lpad(hex(24), 4, '0')))"
        ),
        F.encode(F.col("text"), "UTF-8"),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, image)
        .when(F.col("doc_id") % 3 == 1, audio)
        .otherwise(video)
        .alias("payload"),
    )


@query(
    "mm_modality_dispatch",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           CAST(CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN n_chars % 640
                WHEN 1 THEN n_chars * 10
                ELSE n_chars % 100 END AS BIGINT) AS dim1,
           CAST(CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN length(text) % 480
                WHEN 1 THEN 0 ELSE 24 END AS BIGINT) AS dim2,
           CAST(octet_length(encode(text)) AS BIGINT) AS body_bytes
    FROM documents
    """,
)
def mm_modality_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality routing — the dispatch step in front of every multimodal
    pipeline: sniff each row's MAGIC BYTES (never trust a filename or a
    side column), route to the matching per-modality parse branch, and
    union the branches back under one feature schema. Each branch is a
    filter + native byte-slicing projection, so Catalyst pushes the
    magic predicate into all three branch scans and the union is
    scan-parallel; a real deployment hangs its codec UDFs
    (mm_decode_features' Arrow path) off exactly these branches.

    The header parses are big-endian byte slices via hex arithmetic —
    real byte handling, no Python — and the oracle recomputes the fields
    from the doc columns the payloads were derived from (mm_binary_meta's
    convention: byte accounting proves the round-trip)."""
    mixed = attach_mixed_modality(load(spark, sf_dir, "documents"))
    magic = F.expr("substring(payload, 1, 4)")

    def u16(off: int) -> F.Column:
        return F.conv(
            F.hex(F.expr(f"substring(payload, {off}, 2)")), 16, 10
        ).cast("bigint")

    def u32(off: int) -> F.Column:
        return F.conv(
            F.hex(F.expr(f"substring(payload, {off}, 4)")), 16, 10
        ).cast("bigint")

    image = mixed.filter(magic == F.lit(MAGIC)).select(
        "doc_id",
        F.lit("image").alias("modality"),
        u16(5).alias("dim1"),
        u16(7).alias("dim2"),
        (F.octet_length("payload") - 8).cast("bigint").alias("body_bytes"),
    )
    audio = mixed.filter(magic == F.lit(MAGIC_AUDIO)).select(
        "doc_id",
        F.lit("audio").alias("modality"),
        u32(5).alias("dim1"),
        F.lit(0).cast("bigint").alias("dim2"),
        (F.octet_length("payload") - 8).cast("bigint").alias("body_bytes"),
    )
    video = mixed.filter(magic == F.lit(MAGIC_VIDEO)).select(
        "doc_id",
        F.lit("video").alias("modality"),
        u16(5).alias("dim1"),
        u16(7).alias("dim2"),
        (F.octet_length("payload") - 8).cast("bigint").alias("body_bytes"),
    )
    return image.unionByName(audio).unionByName(video)
