"""WebDataset tar-shard export: byte-determinism of the shards, the
txt/json member pairing, and JSON metadata round-trip — properties the
manifest oracle cannot see."""

import hashlib
import io
import json
import os
import tarfile

from dig_aggregator_core_spark.operators import scans as SC


def _shard_md5s(path):
    out = {}
    for f in sorted(os.listdir(path)):
        if f.endswith(".tar"):
            with open(os.path.join(path, f), "rb") as fh:
                out[f] = hashlib.md5(fh.read()).hexdigest()
    return out


def test_export_is_byte_deterministic_and_members_pair(spark, sf_dir):
    SC.sink_webdataset_shards(spark, sf_dir).collect()
    path = SC._scratch("docs_webdataset")
    first = _shard_md5s(path)
    assert len(first) == SC._EXPORT_SHARDS
    SC.sink_webdataset_shards(spark, sf_dir).collect()
    assert _shard_md5s(path) == first  # re-export byte-identical

    docs = {
        r["doc_id"]: r
        for r in spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).collect()
    }
    seen = set()
    for f in sorted(os.listdir(path)):
        if not f.endswith(".tar"):
            continue
        with tarfile.open(os.path.join(path, f)) as tf:
            names = tf.getnames()
            keys = {n.rsplit(".", 1)[0] for n in names}
            # every sample has exactly a .txt and a .json member
            assert sorted(names) == sorted(
                k + e for k in keys for e in (".txt", ".json")
            )
            for k in keys:
                key = int(k)
                meta = json.loads(
                    tf.extractfile(k + ".json").read().decode("utf-8")
                )
                txt = tf.extractfile(k + ".txt").read().decode("utf-8")
                d = docs[key]
                assert meta == {
                    "doc_id": key,
                    "lang": d["lang"],
                    "n_chars": int(d["n_chars"]),
                }
                assert txt == d["text"]
                seen.add(key)
    assert seen == set(docs)  # nothing dropped, nothing invented
