"""Per-query regression diff between two bench JSON files.

Totals fluctuate ±20% run-to-run from cold codegen, so regressions are
called per-query with BOTH a ratio and an absolute floor (a 3x jump on
a 40 ms query is noise; a 1.5x jump on a 1 s query is real).  Prefer
BENCH_WARM=1 runs on both sides for tighter comparisons.

Usage: python tools/bench_diff.py OLD.json NEW.json [ratio] [floor_s]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    old = json.loads(open(old_path).read().strip().splitlines()[-1])["queries"]
    new = json.loads(open(new_path).read().strip().splitlines()[-1])["queries"]
    shared = sorted(set(old) & set(new))
    print(
        f"{len(shared)} shared queries; old total "
        f"{sum(old[q] for q in shared):.1f}s new total "
        f"{sum(new[q] for q in shared):.1f}s"
    )
    regressions = [
        (q, old[q], new[q])
        for q in shared
        if new[q] > old[q] * ratio and new[q] > floor
    ]
    improvements = [
        (q, old[q], new[q])
        for q in shared
        if old[q] > new[q] * ratio and old[q] > floor
    ]
    for title, rows in (("REGRESSIONS", regressions), ("improvements", improvements)):
        print(f"\n{title} (> {ratio}x and > {floor}s):")
        for q, a, b in sorted(rows, key=lambda t: -(t[2] - t[1])):
            print(f"  {q:34s} {a:7.3f} -> {b:7.3f}")
        if not rows:
            print("  none")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"\nremoved queries: {only_old}")
    if only_new:
        print(f"\nnew queries: {only_new}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
