"""Round-over-round bench comparison: diff BENCH_LAST.json (or a given
file) against a prior round's BENCH_r{N}.json and report per-query
movers, so a regression never hides inside a growing total.

BENCH_r04+ driver files store only the stdout tail (the full line
exceeded the driver's capture window before bench.py wrote
BENCH_LAST.json). Recovery ladder, in order:
1. a real top-level "queries" map (no sentinel keys);
2. a '"queries": ' offset inside the tail whose decoded map is real
   (the r4/r5 shape — the tail held the complete first line);
3. a tail that STARTS mid-map (the r6 shape: the driver window kept the
   sentinel second line plus a truncated first-line fragment) — the
   fragment is wrapped and decoded, dropping only the first, cut-off
   entry, and the partial coverage is reported;
4. the committed BENCH_LAST.json nearest the driver file's round, via
   `git log` (bench.py always writes the full map there before the
   driver captures stdout).

Usage: python tools/benchdiff.py [PREV [CUR]] [--threshold=1.4]
       PREV defaults to the newest BENCH_r*.json, CUR to BENCH_LAST.json.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _real_map(q: object) -> dict[str, float] | None:
    if (
        isinstance(q, dict)
        and q
        and not any(k.startswith("_") for k in q)
        and all(isinstance(v, (int, float)) for v in q.values())
    ):
        return q
    return None


def _from_tail_offsets(tail: str) -> dict[str, float] | None:
    for m in re.finditer(r'"queries": ', tail):
        try:
            obj, _ = json.JSONDecoder().raw_decode(tail[m.end():])
        except ValueError:
            continue
        got = _real_map(obj)
        if got:
            return got
    return None


def _from_truncated_head(tail: str) -> dict[str, float] | None:
    """The tail begins mid-map: '...oseness": 0.531, "name": 1.2, ...}'.
    Re-enter the map after the first complete entry and decode to the
    closing brace; only the cut-off first entry is lost."""
    first = tail.split("\n", 1)[0]
    start = first.find(", ")
    if start < 0:
        return None
    frag = "{" + first[start + 2:]
    end = frag.find("}")
    if end < 0:
        return None
    try:
        obj = json.loads(frag[: end + 1])
    except ValueError:
        return None
    return _real_map(obj)


def _from_git_history(path: str) -> dict[str, float] | None:
    """Driver files are committed at round close right before (or with)
    BENCH_LAST.json; the commit that touched `path` sits on a tree whose
    BENCH_LAST.json holds the same run's full map."""
    rel = os.path.relpath(path, ROOT)
    try:
        sha = subprocess.run(
            ["git", "-C", ROOT, "log", "-1", "--format=%H", "--", rel],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not sha:
            return None
        blob = subprocess.run(
            ["git", "-C", ROOT, "show", f"{sha}:BENCH_LAST.json"],
            capture_output=True, text=True, check=True,
        ).stdout
    except (subprocess.CalledProcessError, OSError):
        return None
    try:
        d = json.loads(blob.splitlines()[0])
    except (ValueError, IndexError):
        return None
    return _real_map(d.get("queries"))


def load_queries(path: str) -> dict[str, float]:
    d = json.load(open(path))
    got = _real_map(d.get("queries"))
    if got:
        return got
    tail = d.get("tail", "")
    got = _from_tail_offsets(tail)
    if got:
        return got
    got = _from_truncated_head(tail)
    if got:
        print(
            f"note: {os.path.basename(path)} tail is mid-map truncated; "
            f"recovered {len(got)} entries (first entry lost)",
            file=sys.stderr,
        )
        return got
    got = _from_git_history(path)
    if got:
        print(
            f"note: {os.path.basename(path)} map recovered from the "
            "committed BENCH_LAST.json of its round",
            file=sys.stderr,
        )
        return got
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
    if not shared:
        raise SystemExit("no shared queries between the two files")
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
