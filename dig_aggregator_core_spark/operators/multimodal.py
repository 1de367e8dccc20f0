"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decode/feature-extraction as Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the actual decode is STUBBED:
`decode_image` raises NotImplementedError, and the pipeline runs through
`fake_decode` — a deterministic stand-in that parses our synthetic header.
Everything Spark-side (schemas, binary handling, mapInPandas batch shape,
partitioning) is real and tested; swapping in a real codec is a one-function
change.

Scale: binary payloads ride in the row (parquet binary column); feature
extraction is mapInPandas so payload bytes never round-trip through the JVM
row format one cell at a time — Arrow moves whole batches.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

MAGIC = b"FAKE"


def decode_image(payload: bytes) -> dict:
    """Real codec hook — not available in this container."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/ffmpeg) not present in "
        "this environment; use fake_decode for the synthetic FAKE format"
    )


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


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            d = fake_decode(bytes(payload))
            rows.append(
                (
                    doc_id,
                    d["width"],
                    d["height"],
                    d["body_len"],
                    # deterministic fake feature: mean byte value of body
                    float(sum(bytes(payload)[8:])) / max(d["body_len"], 1),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "body_len", "mean_byte"]
        )


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(n_chars % 640 AS INT) AS width,
           CAST(length(text) % 480 AS INT) AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS body_len,
           ROUND(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
                 (acc, c) -> acc + c) AS DOUBLE)
                 / greatest(octet_length(encode(text)), 1), 6) AS mean_byte
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract through mapInPandas (Arrow batches): parses
    the binary header and computes a deterministic body feature. The oracle
    recomputes the same quantities from the source text (ASCII corpus, so
    byte values == code points)."""
    docs = attach_binary(load(spark, sf_dir, "documents"))
    out = docs.select("doc_id", "payload").mapInPandas(
        _decode_batches,
        schema="doc_id long, width int, height int, body_len long, mean_byte double",
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
