"""Wire-format interop for the pure-Python Avro codec (sources/avroio.py)
against the Apache Avro CORE Java library Spark bundles (avro-1.12.1.jar,
driven over py4j) — the jar the environment DOES ship, unlike the
spark-avro connector. Files our codec writes must parse in
org.apache.avro.file.DataFileReader and vice versa: values, null and
deflate codecs, multi-block layout, ["null", string] unions."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from dig_aggregator_core_spark.sources.avroio import (
    index_blocks,
    read_avro,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "p", "type": "string"},
        {"name": "v", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "opt", "type": ["null", "string"]},
    ],
}

ROWS = [
    {
        "k": i,
        "p": f"p{i % 5}",
        "v": i * 1.5,
        "ok": i % 2 == 0,
        "opt": None if i % 3 == 0 else f"s{i}",
    }
    for i in range(700)
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_python_roundtrip_multiblock(codec):
    fp = os.path.join(tempfile.gettempdir(), f"avro_self_{codec}.avro")
    n = write_avro(fp, SCHEMA, iter(ROWS), codec=codec, block_records=100)
    assert n == len(ROWS)
    schema, c, blocks = index_blocks(fp)
    assert c == codec and len(blocks) == 7
    assert list(read_avro(fp)) == ROWS


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_python_writes_java_reads(spark, codec):
    jvm = spark._jvm
    fp = os.path.join(tempfile.gettempdir(), f"avro_p2j_{codec}.avro")
    write_avro(fp, SCHEMA, iter(ROWS), codec=codec, block_records=100)
    rd = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(fp), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    out = []
    while rd.hasNext():
        r = rd.next()
        opt = r.get("opt")
        out.append(
            {
                "k": r.get("k"),
                "p": str(r.get("p")),
                "v": r.get("v"),
                "ok": r.get("ok"),
                "opt": None if opt is None else str(opt),
            }
        )
    rd.close()
    assert out == ROWS


def test_java_writes_python_reads(spark):
    jvm = spark._jvm
    jsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jsch)
    )
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    fp = os.path.join(tempfile.gettempdir(), "avro_j2p.avro")
    w.create(jsch, jvm.java.io.File(fp))
    for r in ROWS[:200]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(jsch)
        for kk, vv in r.items():
            rec.put(kk, vv)
        w.append(rec)
    w.close()
    assert list(read_avro(fp)) == ROWS[:200]
