"""BPE apply-path scaling probe in MERGE-RULE count (r10 verdict
item 4).

Every existing probe and gate runs the subword apply path with <= 3
merge rules, but ``bpe_subword_encode`` replays rules as SEQUENTIAL
in-scan array folds with a (lazy) ``localCheckpoint`` per rank — a
realistic shipped vocabulary is hundreds to 32k merges, which is
thousands of chained plans and checkpoint materializations of the
word-TYPE table: a scaling dimension no SCALING.md row measured.

This probe measures exactly that axis: encode wall time at 64 / 256 /
1024 learned rules (corpus volume fixed), so the per-rank fold-chain
cost is the only thing moving.

Method
------
- The base synthetic corpus has only ~31 distinct words (~138 type
  chars) — nowhere near enough adjacent-pair diversity to learn 1024
  rules — so the probe enriches the word-type table with the standing
  ``inflate_docs_salted`` recipe (replica-suffixed tokens, disjoint
  vocabularies per replica: type count and pair diversity scale with
  the factor while per-type frequency distribution stays put).
- Rules are learned DRIVER-SIDE by ``py_learn_subword_merges`` — a
  pure-Python mirror of ``operators.text.bpe_subword_merges``
  (frequency-weighted pair counts over the word-type dict, self-pairs
  excluded, max count with ties to the lexicographically smallest
  pair, every occurrence fused) — because learning 1024 rules through
  the Spark learner is 1024 driver round-trips of LEARN cost, which
  would drown the APPLY measurement this probe is after.  The mirror
  is validated before timing: its first rules must equal
  ``bpe_subword_merges`` output row-for-row on the base corpus (the
  same cross-check discipline as the oracle twins).  The collect is
  bounded: word TYPES only, asserted < 500k rows.
- Each timed run is ``bpe_subword_encode(inflated_docs, rules[:R])``
  driven to the noop sink (scale_probe.run_once).

Usage:  python tools/probe_bpe_rules.py [sf_dir] [factor] [R ...]
        (defaults: /root/testdata/sf0.01, factor 16, R = 16 64 256 1024)
Prints one row per R; paste into SCALING.md's r11 section.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table


def py_learn_subword_merges(
    word_freqs: dict[str, int], n_merges: int, eow: str = "</w>"
) -> list[tuple[str, str]]:
    """Driver-side mirror of ``operators.text.bpe_subword_merges``:
    same pair statistic (corpus frequency = type count x word
    frequency over ALL adjacent positions), same self-pair exclusion,
    same (count DESC, pair ASC) argmax, same fuse-every-occurrence
    step (non-overlapping by l != r).  Validated against the Spark
    learner in main() before any timing is trusted."""
    syms: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        s = tuple(list(w) + [eow]) if w else (eow,)
        syms[s] = syms.get(s, 0) + f
    rules: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, f in syms.items():
            for i in range(len(s) - 1):
                if s[i] != s[i + 1]:
                    p = (s[i], s[i + 1])
                    counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        left, right = best
        fused = left + right
        nxt: dict[tuple[str, ...], int] = {}
        for s, f in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == left and s[i + 1] == right:
                    out.append(fused)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + f
        syms = nxt
        rules.append(best)
    return rules


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    r_counts = [int(a) for a in sys.argv[3:]] or [16, 64, 256, 1024]

    from pyspark.sql import functions as F

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        bpe_subword_encode,
        bpe_subword_merges,
        tokens,
    )
    from scale_probe import inflate_docs_salted, run_once

    spark = get_session("probe-bpe-rules")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents")

    # --- validate the python learner mirror against the Spark learner
    base_freqs = {
        r["_w"]: r["_f"]
        for r in base.filter(F.col("text").isNotNull())
        .select(F.explode(tokens("text")).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").alias("_f"))
        .collect()
    }
    n_check = 8
    spark_rules = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_subword_merges(base, "text", n_merges=n_check)
        .orderBy("merge_round")
        .collect()
    ]
    py_rules = py_learn_subword_merges(base_freqs, n_check)
    assert py_rules == spark_rules, (
        "python learner mirror diverged from bpe_subword_merges:\n"
        f"  spark: {spark_rules}\n  python: {py_rules}"
    )
    print(f"learner mirror validated: first {n_check} rules identical")

    # --- enriched corpus + big learned rule table -------------------
    docs = inflate_docs_salted(base, factor).localCheckpoint()
    wt = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(tokens("text")).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").alias("_f"))
    )
    n_types = wt.count()
    assert n_types < 500_000, f"unexpected type blow-up: {n_types}"
    freqs = {r["_w"]: r["_f"] for r in wt.collect()}
    t0 = time.perf_counter()
    all_rules = py_learn_subword_merges(freqs, max(r_counts))
    print(
        f"factor {factor}: {n_types} word types, learned "
        f"{len(all_rules)}/{max(r_counts)} rules in "
        f"{time.perf_counter() - t0:.1f}s driver-side"
    )

    n_docs = docs.count()
    print(f"{'rules':>6} {'sec':>8} {'sec/100rules':>13}  (docs={n_docs})")
    for rc in r_counts:
        if rc > len(all_rules):
            print(f"{rc:>6}  corpus exhausted at {len(all_rules)} rules")
            continue
        # time construction + write TOGETHER: the fixpoint rounds run
        # EAGERLY during bpe_subword_encode() construction (eager
        # localCheckpoint + termination probe per round), so a
        # write-only timer would miss nearly all the apply work (the
        # original r11 probe did exactly that — fold-path rows were
        # honest because fold rounds are lazy and execute during the
        # write, but fixpoint rows only timed the final noop write)
        t0 = time.perf_counter()
        run_once(bpe_subword_encode(docs, all_rules[:rc]))
        t = time.perf_counter() - t0
        print(f"{rc:>6} {t:8.1f} {t / rc * 100:13.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
