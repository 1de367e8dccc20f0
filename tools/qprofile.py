"""Per-query build/execute split profiler (guide §1): for each named
query, times fn(spark, sf_dir) (driver-side construction — for streaming
ops this includes the stream run) and the noop-sink action separately,
min-of-N each. Prints one JSON line per query plus a sorted summary.

Usage: python tools/qprofile.py q1 q2 ...   (or --top N to take the N
slowest from a bench JSON given with --bench)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dig_aggregator_core_spark import registry
from dig_aggregator_core_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--bench", default=None)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = list(args.names)
    if args.top and args.bench:
        qs = json.load(open(args.bench))["queries"]
        names += [
            k
            for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[: args.top]
            if k not in names
        ]

    registry.load_all()
    spark = get_spark(app_name="qprofile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = []
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        b_best = e_best = t_best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"qprofile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            b_best = min(b_best, t1 - t0)
            e_best = min(e_best, t2 - t1)
            t_best = min(t_best, t2 - t0)
        rows.append(
            {
                "query": name,
                "build_s": round(b_best, 3),
                "exec_s": round(e_best, 3),
                "total_s": round(t_best, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    rows.sort(key=lambda r: -r["total_s"])
    print(f"\n{'query':42s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for r in rows:
        print(
            f"{r['query']:42s} {r['build_s']:7.2f} {r['exec_s']:7.2f}"
            f" {r['total_s']:7.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
