"""The streaming ANN twin's committed-index seed clone (r13).

_clone_committed_index hardlinks the flocked, content-fingerprinted
seed's immutable part files into a per-run private dir. Pin the two
properties the mechanism rests on:

1. appends into a clone never leak back into the seed (private-run
   semantics — the reason the twin had a per-run dir in the first
   place);
2. a second clone of the same seed serves exactly the committed rows,
   bit-identical to a fresh _build_committed_index output.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators.similarity import (
    _INC_COMMIT_FILTER,
    _build_committed_index,
    _clone_committed_index,
    _vecs,
    ann_index_append,
)


def _data_files(root: str) -> set[str]:
    out = set()
    for r, _d, names in os.walk(os.path.join(root, "index.parquet")):
        for n in names:
            if not n.startswith(("_", ".")):
                out.add(os.path.relpath(os.path.join(r, n), root))
    return out


def test_clone_append_does_not_mutate_seed(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="clone_test_")
    c1 = os.path.join(base, "c1")
    _clone_committed_index(spark, sf_dir, c1)
    # the seed the clone came from
    from dig_aggregator_core_spark.operators.similarity import (
        _inc_index_path,
    )

    seed = _inc_index_path(spark, sf_dir, suffix="_seed")
    seed_files_before = _data_files(seed)
    seed_stats_before = {
        f: os.stat(os.path.join(seed, f)).st_size
        for f in seed_files_before
    }

    batch = _vecs(spark, sf_dir).filter(~F.expr(_INC_COMMIT_FILTER))
    ann_index_append(spark, c1, batch)

    # appends landed in the clone, not the seed
    assert _data_files(seed) == seed_files_before
    for f, size in seed_stats_before.items():
        assert os.stat(os.path.join(seed, f)).st_size == size
    assert len(_data_files(c1)) > len(seed_files_before)


def test_clone_equals_fresh_build(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="clone_eq_")
    c2 = os.path.join(base, "c2")
    fresh = os.path.join(base, "fresh")
    _clone_committed_index(spark, sf_dir, c2)
    _build_committed_index(spark, sf_dir, fresh)
    with open(os.path.join(c2, "_width")) as f1, open(
        os.path.join(fresh, "_width")
    ) as f2:
        assert f1.read() == f2.read()
    a = spark.read.parquet(os.path.join(c2, "index.parquet"))
    b = spark.read.parquet(os.path.join(fresh, "index.parquet"))
    rows_a = sorted(map(repr, a.collect()))
    rows_b = sorted(map(repr, b.collect()))
    assert rows_a == rows_b
