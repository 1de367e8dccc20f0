"""Round-over-round bench comparison: diff BENCH_LAST.json (or a given
file) against a prior round's BENCH_r{N}.json and report per-query
movers, so a regression never hides inside a growing total.

BENCH_r04+ driver files store only the stdout tail (the full line
exceeded the driver's capture window before bench.py wrote
BENCH_LAST.json); the tail still contains the complete queries map, so
it is recovered with a raw JSON decode at the '"queries": ' offset.

Usage: python tools/benchdiff.py [PREV [CUR]] [--threshold=1.4]
       PREV defaults to the newest BENCH_r*.json, CUR to BENCH_LAST.json.
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_queries(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict) and d["queries"]:
        q = d["queries"]
        if not any(k.startswith("_") for k in q):
            return q
    tail = d.get("tail", "")
    key = '"queries": '
    if key in tail:
        obj, _ = json.JSONDecoder().raw_decode(tail[tail.index(key) + len(key):])
        return obj
    raise SystemExit(f"no per-query map recoverable from {path}")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    thr = 1.4
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            thr = float(a.split("=", 1)[1])
    prev_path = args[0] if args else sorted(
        glob.glob(os.path.join(ROOT, "BENCH_r*.json"))
    )[-1]
    cur_path = args[1] if len(args) > 1 else os.path.join(ROOT, "BENCH_LAST.json")
    prev, cur = load_queries(prev_path), load_queries(cur_path)
    shared = sorted(set(prev) & set(cur))
    tp = sum(prev[k] for k in shared)
    tc = sum(cur[k] for k in shared)
    print(f"shared rows: {len(shared)}  prev {tp:.1f}s -> cur {tc:.1f}s "
          f"({tc / tp:.2f}x)   new rows: {len(set(cur) - set(prev))}")
    movers = [
        (cur[k] / prev[k], k, prev[k], cur[k])
        for k in shared
        if prev[k] >= 0.1 and (cur[k] / prev[k] >= thr or prev[k] / cur[k] >= thr)
    ]
    for r, k, p, c in sorted(movers, key=lambda t: -t[0]):
        tag = "SLOWER" if r >= 1 else "faster"
        print(f"  {k:40s} {p:7.3f} -> {c:7.3f}  {r:5.2f}x {tag}")
    if not movers:
        print("  no movers beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
