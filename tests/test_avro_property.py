"""Property tests for the pure-Python Avro codec: encode/decode must
invert for arbitrary values across the full value domains — int64
extremes exercise the zigzag-varint path, arbitrary unicode the UTF-8
length-prefix path, and random null patterns the union branch."""

from __future__ import annotations

import math
import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from dig_aggregator_core_spark.sources.avroio import (
    read_avro,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "p",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "o", "type": ["null", "long"]},
    ],
}

row_st = st.fixed_dictionaries(
    {
        "k": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.text(max_size=64),
        "d": st.floats(allow_nan=False, width=64),
        "b": st.booleans(),
        "o": st.one_of(
            st.none(),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
    }
)


def _eq(a, b):
    if isinstance(a, float):
        return (
            math.isinf(a)
            and math.isinf(b)
            and (a > 0) == (b > 0)
            or a == b
        )
    return a == b


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(row_st, max_size=40), codec=st.sampled_from(["null", "deflate"]))
def test_roundtrip_inverts(rows, codec):
    fp = os.path.join(
        tempfile.gettempdir(), f"avro_prop_{os.getpid()}.avro"
    )
    n = write_avro(fp, SCHEMA, iter(rows), codec=codec, block_records=7)
    assert n == len(rows)
    back = list(read_avro(fp))
    assert len(back) == len(rows)
    for got, want in zip(back, rows):
        for key in want:
            assert _eq(got[key], want[key]), (key, got[key], want[key])
