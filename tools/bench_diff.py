"""Per-query regression diff between two bench JSON files, with
machine-measured EPOCH adjudication.

Totals fluctuate ±20% run-to-run from cold codegen, and the sandbox
VM itself drifts between sessions (observed r8: a reboot moved
untouched anchor queries 1.5-3x on identical code).  Calling
regressions therefore needs two corrections:

- per-query ratio + absolute floor (a 3x jump on a 40 ms query is
  noise; a 1.5x jump on a 1 s query is real) — prefer BENCH_WARM=1
  runs on both sides;
- an EPOCH RATIO measured on a fixed anchor set of untouched,
  plan-diverse queries, timed ISOLATED in a fresh JVM next to each
  suite run.  A query is flagged only if it moved >= ratio x
  *relative to the anchors* — code-independent machine drift divides
  out instead of being adjudicated by hand in BENCH_NOTES.md.

Usage:
  python tools/bench_diff.py --anchors OUT.json
      Time the 5-query anchor set (warm min-of-2, fresh session in
      THIS process — invoke from a fresh CLI, nothing else running)
      at $SPARK_GRAFT_SF_DIR and write {"anchors": {q: sec}}.
      Run it immediately before or after each suite run.

  python tools/bench_diff.py OLD.json NEW.json [ratio] [floor_s] \
      [--old-anchors A.json] [--new-anchors B.json]
      Diff two bench files.  With both anchor files, the epoch ratio
      (median of per-anchor new/old) rescales OLD before flagging,
      and is printed with the verdict.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

#: Fixed anchor set: queries whose code has been untouched for many
#: rounds, spanning the main plan shapes (scan+filter+agg, wide
#: join+agg, TakeOrdered, window, broadcast star join) but NOT the
#: tokenize/pair-expansion families that active work keeps touching.
#: Editing an anchor's code invalidates epoch comparisons — pick a
#: replacement and say so in BENCH_NOTES.md.
ANCHORS = (
    "tpch_q6",
    "tpch_q1",
    "tpch_q13",
    "top_orders",
    "running_user_value",
)


def measure_anchors(out_path: str) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bench-anchors")
    qs = entrymod.queries()

    def run_once(df) -> float:
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run_once(qs["flagship"](spark, sf_dir))  # warmup: files + codegen
    timings = {}
    for name in ANCHORS:
        t = min(run_once(qs[name](spark, sf_dir)) for _ in range(2))
        timings[name] = round(t, 3)
    payload = {"sf_dir": sf_dir, "anchors": timings}
    with open(out_path, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(json.dumps(payload))
    return 0


def epoch_ratio(old_anchor_path: str, new_anchor_path: str) -> tuple[float, dict]:
    def _anchors(path: str) -> dict:
        data = json.load(open(path))
        if "anchors" not in data or not isinstance(data["anchors"], dict):
            raise SystemExit(
                f"bench_diff: {path} has no 'anchors' map — generate it "
                "with `python tools/bench_diff.py --anchors <out.json>`"
            )
        return data["anchors"]

    old = _anchors(old_anchor_path)
    new = _anchors(new_anchor_path)
    shared = sorted(set(old) & set(new))
    ratios = {q: new[q] / old[q] for q in shared if old[q] > 0}
    if not ratios:
        raise SystemExit(
            "bench_diff: anchor files are incompatible — no shared anchor "
            f"query has a positive old timing (old has {sorted(old)}, "
            f"new has {sorted(new)}); re-measure both sides with the same "
            "anchor set"
        )
    return statistics.median(ratios.values()), ratios


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--anchors":
        return measure_anchors(args[1])
    kw = {}
    pos = []
    i = 0
    while i < len(args):
        if args[i] in ("--old-anchors", "--new-anchors"):
            kw[args[i]] = args[i + 1]
            i += 2
        else:
            pos.append(args[i])
            i += 1
    if len(pos) < 2:
        raise SystemExit(
            "usage: bench_diff.py <old_bench.json> <new_bench.json> "
            "[ratio] [floor] [--old-anchors A.json --new-anchors B.json]"
            "\n       bench_diff.py --anchors <out.json>"
        )
    old_path, new_path = pos[0], pos[1]
    ratio = float(pos[2]) if len(pos) > 2 else 1.5
    floor = float(pos[3]) if len(pos) > 3 else 0.5
    ep = 1.0
    if "--old-anchors" in kw and "--new-anchors" in kw:
        ep, per = epoch_ratio(kw["--old-anchors"], kw["--new-anchors"])
        print(
            f"epoch ratio (median of {len(per)} anchors, new/old): "
            f"{ep:.3f}  " + " ".join(f"{q}={r:.2f}" for q, r in per.items())
        )
        if not 0.5 <= ep <= 2.0:
            print(
                "WARNING: epoch ratio outside [0.5, 2.0] — the machine "
                "moved a lot between runs; treat every per-query verdict "
                "as suspect and re-measure on one epoch if possible"
            )
    old = json.loads(open(old_path).read().strip().splitlines()[-1])["queries"]
    new = json.loads(open(new_path).read().strip().splitlines()[-1])["queries"]
    shared = sorted(set(old) & set(new))
    print(
        f"{len(shared)} shared queries; old total "
        f"{sum(old[q] for q in shared):.1f}s new total "
        f"{sum(new[q] for q in shared):.1f}s"
        + (f" (epoch-adjusted old: {sum(old[q] for q in shared) * ep:.1f}s)" if ep != 1.0 else "")
    )
    regressions = [
        (q, old[q], new[q])
        for q in shared
        if new[q] > old[q] * ep * ratio and new[q] > floor
    ]
    improvements = [
        (q, old[q], new[q])
        for q in shared
        if old[q] * ep > new[q] * ratio and old[q] * ep > floor
    ]
    for title, rows in (("REGRESSIONS", regressions), ("improvements", improvements)):
        print(f"\n{title} (> {ratio}x epoch-adjusted and > {floor}s):")
        for q, a, b in sorted(rows, key=lambda t: -(t[2] - t[1])):
            print(f"  {q:34s} {a:7.3f} -> {b:7.3f}  (adj old {a * ep:7.3f})")
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
