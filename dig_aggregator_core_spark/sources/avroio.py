"""Pure-Python Apache Avro object-container codec + Spark surfaces.

The environment ships Spark WITHOUT the external ``spark-avro`` connector
jar (and has no network to install it), which left the Avro scan as the
single environment-blocked row of SURVEY §2.1. This module closes the gap
from first principles: a from-spec implementation of the Avro 1.x object
container file format (Apache Avro specification, "Object Container
Files" + "Binary Encoding" sections — public documentation only):

- magic ``Obj\\x01``; file-metadata map (``avro.schema`` JSON,
  ``avro.codec``); 16-byte sync marker
- data blocks: record count (zigzag varint long), payload byte size,
  payload (``null`` or ``deflate``/RFC-1951 codec), sync marker
- binary encoding: zigzag-varint longs, little-endian IEEE-754 doubles,
  length-prefixed UTF-8 strings/bytes, 1-byte booleans, zero-byte nulls,
  unions as (branch index, value)

Supported schemas: records of primitives (null / boolean / int / long /
float / double / string / bytes) and ``["null", primitive]`` unions —
the envelope every columnar exchange needs; nested records/arrays are a
straightforward extension of ``_read_datum``.

Interop is NOT taken on faith: tests/test_avro_interop.py round-trips
both directions against the Apache Avro *core* Java library that Spark
does bundle (avro-1.12.1.jar, driven over py4j) — files written by this
module are read back by ``org.apache.avro.file.DataFileReader`` and vice
versa, byte-compatibility pinned on values, codecs, and multi-block
layout.

Spark surfaces:
- :class:`GraftAvroDataSource` — a Python DataSource (Spark 4 API)
  whose ``partitions()`` enumerates BLOCK RANGES per file (the driver
  indexes block offsets by reading only the ~20-byte block headers and
  seeking past payloads), so a many-block file scans in parallel exactly
  like Hadoop's sync-marker splits.
- :func:`write_avro_partitioned` — a ``foreachPartition`` sink writing
  one container file per Spark partition on executors (distributed
  write, no driver collect).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterator

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic marker (spec: any 16 bytes)

# ------------------------------------------------------------ primitives


def _zigzag_encode(n: int) -> bytes:
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BufferedIOBase) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("varint truncated")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_datum(out: bytearray, typ: Any, v: Any) -> None:
    if isinstance(typ, list):  # union — branch index then value
        if v is None and "null" in typ:
            idx = typ.index("null")
            out += _zigzag_encode(idx)
            return
        idx = next(i for i, t in enumerate(typ) if t != "null")
        out += _zigzag_encode(idx)
        _write_datum(out, typ[idx], v)
        return
    if typ == "null":
        return
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ in ("string", "bytes"):
        b = v.encode("utf-8") if typ == "string" else bytes(v)
        out += _zigzag_encode(len(b))
        out += b
    else:
        raise NotImplementedError(f"avro type {typ!r}")


def _read_datum(buf: io.BufferedIOBase, typ: Any) -> Any:
    if isinstance(typ, list):
        idx = _zigzag_decode(buf)
        return _read_datum(buf, typ[idx])
    if typ == "null":
        return None
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ in ("int", "long"):
        return _zigzag_decode(buf)
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ in ("string", "bytes"):
        n = _zigzag_decode(buf)
        raw = buf.read(n)
        return raw.decode("utf-8") if typ == "string" else raw
    raise NotImplementedError(f"avro type {typ!r}")


def _field_types(schema: dict) -> list[tuple[str, Any]]:
    assert schema["type"] == "record", "container payload must be a record"
    return [(f["name"], f["type"]) for f in schema["fields"]]


# ------------------------------------------------------------- container


def write_avro(
    path: str,
    schema: dict,
    rows: Iterator[dict],
    codec: str = "null",
    block_records: int = 1000,
) -> int:
    """Write an Avro object container file; returns the record count."""
    fields = _field_types(schema)
    n_total = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        f.write(_zigzag_encode(len(meta)))
        for k, v in meta.items():
            kb = k.encode()
            f.write(_zigzag_encode(len(kb)))
            f.write(kb)
            f.write(_zigzag_encode(len(v)))
            f.write(v)
        f.write(_zigzag_encode(0))  # map terminator
        f.write(SYNC)

        block: bytearray = bytearray()
        n_block = 0

        def flush() -> None:
            nonlocal block, n_block, n_total
            if not n_block:
                return
            payload = bytes(block)
            if codec == "deflate":  # RFC 1951 raw deflate, per spec
                c = zlib.compressobj(wbits=-15)
                payload = c.compress(payload) + c.flush()
            f.write(_zigzag_encode(n_block))
            f.write(_zigzag_encode(len(payload)))
            f.write(payload)
            f.write(SYNC)
            n_total += n_block
            block = bytearray()
            n_block = 0

        for row in rows:
            for name, typ in fields:
                _write_datum(block, typ, row.get(name))
            n_block += 1
            if n_block >= block_records:
                flush()
        flush()
    return n_total


def _read_header(f) -> tuple[dict, str, bytes]:
    if f.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _zigzag_decode(f)
        if n == 0:
            break
        if n < 0:  # spec: negative count prefixes a block byte size
            n = -n
            _zigzag_decode(f)
        for _ in range(n):
            klen = _zigzag_decode(f)
            k = f.read(klen).decode()
            vlen = _zigzag_decode(f)
            meta[k] = f.read(vlen)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = f.read(16)
    return schema, codec, sync


def index_blocks(path: str) -> tuple[dict, str, list[tuple[int, int, int]]]:
    """(schema, codec, [(offset, n_records, byte_size)]) — reads ONLY the
    ~20-byte block headers, seeking past payloads: the cheap driver-side
    split enumeration (the role Hadoop's sync-marker scan plays)."""
    blocks: list[tuple[int, int, int]] = []
    with open(path, "rb") as f:
        schema, codec, sync = _read_header(f)
        while True:
            off = f.tell()
            try:
                cnt = _zigzag_decode(f)
            except EOFError:
                break
            size = _zigzag_decode(f)
            f.seek(size, os.SEEK_CUR)
            if f.read(16) != sync:
                raise ValueError(f"sync marker mismatch at block {off}")
            blocks.append((off, cnt, size))
    return schema, codec, blocks


def read_avro_blocks(
    path: str, offsets: list[int] | None = None
) -> Iterator[dict]:
    """Decode records, optionally only from the blocks at `offsets`."""
    with open(path, "rb") as f:
        schema, codec, sync = _read_header(f)
        fields = _field_types(schema)
        targets = offsets
        if targets is None:
            _, _, blocks = index_blocks(path)
            targets = [b[0] for b in blocks]
        for off in targets:
            f.seek(off)
            cnt = _zigzag_decode(f)
            size = _zigzag_decode(f)
            payload = f.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            elif codec != "null":
                raise NotImplementedError(f"codec {codec!r}")
            buf = io.BytesIO(payload)
            for _ in range(cnt):
                yield {name: _read_datum(buf, typ) for name, typ in fields}


def read_avro(path: str) -> Iterator[dict]:
    return read_avro_blocks(path, None)


# --------------------------------------------------------- Spark surfaces

_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def _pa_types(schema: dict) -> dict:
    """Arrow type per field, matching _AVRO_TO_SPARK (unions take their
    non-null branch; the Arrow array carries the nulls)."""
    import pyarrow as pa

    m = {
        "boolean": pa.bool_(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "bytes": pa.binary(),
    }
    out = {}
    for name, typ in _field_types(schema):
        if isinstance(typ, list):
            typ = next(t for t in typ if t != "null")
        out[name] = m[typ]
    return out


def _spark_ddl(schema: dict) -> str:
    cols = []
    for name, typ in _field_types(schema):
        if isinstance(typ, list):
            typ = next(t for t in typ if t != "null")
        cols.append(f"{name} {_AVRO_TO_SPARK[typ]}")
    return ", ".join(cols)


def make_avro_datasource():
    """Build (lazily — the DataSource API wants an active session) the
    ``graftavro`` Python DataSource class: block-range partitions, Arrow
    batched rows, schema inferred from the first file's header."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            self.blocks_per_split = int(options.get("blocksPerSplit", "1"))
            files = (
                sorted(
                    os.path.join(self.path, f)
                    for f in os.listdir(self.path)
                    if f.endswith(".avro")
                )
                if os.path.isdir(self.path)
                else [self.path]
            )
            self.files = files
            schema, _codec, _blocks = index_blocks(files[0])
            self.ddl = _spark_ddl(schema)
            self.fields = [n for n, _ in _field_types(schema)]
            self.pa_types = _pa_types(schema)

        def partitions(self):
            parts = []
            k = self.blocks_per_split
            for fp in self.files:
                _s, _c, blocks = index_blocks(fp)
                offs = [b[0] for b in blocks]
                for i in range(0, len(offs), k):
                    parts.append(InputPartition((fp, tuple(offs[i : i + k]))))
            return parts or [InputPartition((self.files[0], ()))]

        def read(self, partition):
            # Yield ONE Arrow RecordBatch per split instead of per-row
            # Python tuples: the DataSource API pickles every yielded
            # row individually, and the columnar handoff skips that
            # boundary entirely (guide §4 — the decode itself stays
            # pure-Python by design, this is only the transfer).
            import pyarrow as pa

            fp, offs = partition.value
            cols: dict[str, list] = {n: [] for n in self.fields}
            n_rows = 0
            for row in read_avro_blocks(fp, list(offs)):
                for n in self.fields:
                    cols[n].append(row[n])
                n_rows += 1
            if n_rows:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(cols[n], type=self.pa_types[n])
                        for n in self.fields
                    ],
                    names=list(self.fields),
                )

    class GraftAvroDataSource(DataSource):
        @classmethod
        def name(cls):
            return "graftavro"

        def schema(self):
            return _Reader(self.options).ddl

        def reader(self, schema):
            return _Reader(self.options)

    return GraftAvroDataSource


def write_avro_partitioned(
    df, path: str, schema: dict, codec: str = "null"
) -> None:
    """Distributed Avro sink: one container file per Spark partition,
    written executor-side via foreachPartition (no driver collect).

    An under-partitioned input (one-file fixture scan = 1 partition)
    would serialize the whole pure-Python encode + deflate onto one
    worker; spread it to the session's parallelism first (no-op at real
    scale where the input already has splits — guide §2/§4). Measured
    sf0.1 orders write 1.56 s -> 0.79 s."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    os.makedirs(path, exist_ok=True)
    names = [n for n, _ in _field_types(schema)]

    def write_part(it):
        import uuid

        rows = [dict(zip(names, r)) for r in it]
        if not rows:
            return
        fp = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        write_avro(fp, schema, iter(rows), codec=codec, block_records=500)

    df.select(*names).foreachPartition(write_part)
