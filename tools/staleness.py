"""Gate-staleness audit: which registry entries most need a driver re-gate.

The driver's correctness gate samples only the FIRST 50 ``queries()``
entries per round, while the registry keeps growing — so without
deliberate rotation, an entry's latest driver-side proof silently
ages.  This tool makes the rotation mechanical: it joins the registry
order against every ``CORRECTNESS_r*.json`` and prints

- the latest-gate-round histogram (the number the round-5 verdict
  tracked),
- entries whose latest green row is older than ``--max-age`` rounds
  (default 3), i.e. the cohort that should lead the next window,
- never-gated entries (worst class — they outrank every re-gate),
- and whether the CURRENT first-50 window covers the stalest cohort.

``--plan`` additionally emits the NEXT round's window mechanically:
the least-recently-gated 50 entries (never-gated first, then by
latest gate round, ties in registry order) — paste the list into the
``_R{N}_WINDOW`` tuple and put the pins (new gates, changed-seam
re-gates, the standing streaming entry) at the front, displacing the
freshest tail entries.  Rotation floor, for honesty when reading the
stale count: with R registry entries and a 50-row window, strict LRU
rotation re-gates everything every ceil(R/50) rounds, so at
``--max-age`` A the stale count can never drop below R - A*50
(216 - 150 = 66 at the r10 registry) — the per-round 3-SF local
sweep on final code is the standing alternate evidence for that
tail.

Usage: python tools/staleness.py [--max-age N] [--plan]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    max_age = 3
    if "--max-age" in sys.argv:
        max_age = int(sys.argv[sys.argv.index("--max-age") + 1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    latest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if isinstance(row, dict):
                latest[name] = rnd
    if not rounds:
        print("no CORRECTNESS_r*.json found")
        return 1
    current = max(rounds)

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    window = set(names[:50])

    hist: dict[int, int] = {}
    for n in names:
        hist[latest.get(n, 0)] = hist.get(latest.get(n, 0), 0) + 1
    print(f"registry: {len(names)} entries; window: first 50; "
          f"latest driver round on disk: r{current}")
    print("latest-gate histogram (0 = never gated):",
          {f"r{k}": v for k, v in sorted(hist.items())})

    never = [n for n in names if n not in latest]
    if never:
        print(f"\nNEVER-GATED ({len(never)}) — must lead the next window:")
        for n in never:
            mark = "IN-WINDOW" if n in window else "NOT in window"
            print(f"  {n}  [{mark}]")

    stale = sorted(
        ((n, latest[n]) for n in names
         if n in latest and current - latest[n] >= max_age),
        key=lambda kv: kv[1],
    )
    print(f"\nstale (last gate >= {max_age} rounds old): {len(stale)}")
    uncovered = [n for n, _ in stale if n not in window]
    for n, r in stale:
        mark = "IN-WINDOW" if n in window else "NOT in window"
        print(f"  r{r}  {n}  [{mark}]")
    if uncovered:
        print(f"\n{len(uncovered)} stale entries are NOT covered by the "
              "current window — rotate them forward (or document their "
              "alternate evidence in the registry comments).")
    else:
        print("\ncurrent window covers every stale entry (or none exist).")
    floor = max(len(names) - max_age * 50, 0)
    print(f"rotation floor at this registry size: {floor} "
          f"(= {len(names)} - {max_age}*50; strict LRU cannot go lower)")

    if "--plan" in sys.argv:
        order = {n: i for i, n in enumerate(names)}
        lru = sorted(names, key=lambda n: (latest.get(n, -1), order[n]))
        print("\nNEXT-WINDOW PLAN (least-recently-gated 50; put the "
              "round's pins first, displacing the freshest tail):")
        for n in lru[:50]:
            # never-gated is a DISTINCT worst class, not round 0 —
            # print it as such so the plan can't be misread
            tag = f"r{latest[n]}" if n in latest else "never"
            print(f'    "{n}",  # {tag}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
