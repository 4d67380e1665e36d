"""Doc-level `bpe_apply_merges` at realistic rule counts (r11).

`probe_bpe_rules.py` pins the WORD-TYPE-table fixpoint
(`bpe_subword_encode`); this probe pins the other integration point —
`bpe_apply_merges`, whose apply target is the CORPUS itself, where the
active-set property matters most (a converged document exits the loop
instead of being re-materialized every round) and where round count is
bounded by tokens-per-document (~50-80 here), not word length.

Rules are corpus-derived, not learned: the top-R adjacent word pairs
by frequency (l != r, count DESC / pair ASC).  Rules over BASE words
trivially satisfy the fixpoint equivalence precondition (every output
contains the \\x01 separator, so no rule input can equal a later
rule's output) while still interacting through overlapping
occurrences — `_validate_fixpoint_merges` is still run, and a full
fold-vs-fixpoint differential at R=64 (both paths runnable) guards
the timing's meaning before it is trusted.

Usage:  python tools/probe_bpe_apply_docs.py [sf_dir] [factor] [R ...]
        (defaults: /root/testdata/sf0.01, factor 16, R = 64 256)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    r_counts = [int(a) for a in sys.argv[3:]] or [64, 256]

    from pyspark.sql import functions as F

    from etl_based_real_time_air_quality_monitoring_system_spark.operators import text as T
    from scale_probe import inflate_docs_salted, run_once

    spark = get_session("probe-bpe-apply-docs")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents")
    docs = inflate_docs_salted(base, factor).localCheckpoint()
    n_docs = docs.count()

    r_max = max(max(r_counts), 64)
    rules = [
        (r["l"], r["r"])
        for r in docs.filter(F.col("text").isNotNull())
        .select(T.tokens("text").alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_t) - 2), "
                    "i -> struct(_t[i] AS l, _t[i + 1] AS r))"
                )
            ).alias("_p")
        )
        .select("_p.l", "_p.r")
        .filter(F.col("l") != F.col("r"))
        .groupBy("l", "r")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "l", "r")
        .limit(r_max)
        .collect()
    ]
    T._validate_fixpoint_merges(rules, "\x01")
    print(f"{len(rules)} corpus-derived word-pair rules over {n_docs} docs")

    # differential at R=64: sequential fold vs fixpoint, full equality
    r_diff = min(64, len(rules))
    saved = T.BPE_APPLY_FOLD_MAX
    try:
        T.BPE_APPLY_FOLD_MAX = r_diff + 1
        seq = T.bpe_apply_merges(docs, rules[:r_diff]).withColumn(
            "_h", F.md5(F.concat_ws("\x02", "tokens"))
        ).select("doc_id", "_h")
        T.BPE_APPLY_FOLD_MAX = 0
        fix = T.bpe_apply_merges(docs, rules[:r_diff]).withColumn(
            "_h", F.md5(F.concat_ws("\x02", "tokens"))
        ).select("doc_id", "_h")
        n_mismatch = seq.join(fix, "doc_id").filter(
            seq["_h"] != fix["_h"]
        ).count()
        n_seq, n_fix = seq.count(), fix.count()
        assert n_mismatch == 0 and n_seq == n_fix, (
            f"fold-vs-fixpoint divergence: {n_mismatch} mismatched docs, "
            f"counts {n_seq} vs {n_fix}"
        )
        print(f"differential at R={r_diff}: {n_seq} docs identical")
    finally:
        T.BPE_APPLY_FOLD_MAX = saved

    print(f"{'rules':>6} {'sec':>8}  (fixpoint, docs={n_docs})")
    for rc in r_counts:
        if rc > len(rules):
            print(f"{rc:>6}  corpus has only {len(rules)} distinct pairs")
            continue
        # time construction + write together: the fixpoint rounds run
        # EAGERLY during construction, so construction IS the work
        t0 = time.perf_counter()
        run_once(T.bpe_apply_merges(docs, rules[:rc]))
        t = time.perf_counter() - t0
        print(f"{rc:>6} {t:8.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
