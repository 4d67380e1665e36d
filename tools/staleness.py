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

Usage: python tools/staleness.py [--max-age N]
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
