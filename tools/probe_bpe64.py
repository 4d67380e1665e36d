"""Focused 64x probe for the BPE subword family at the DEFAULT heap.

The r9 full probe run OOM'd the default 8 GiB driver heap in the 64x
``bpe_subword_encode`` position sort (SCALING.md "r9 run provenance")
— the per-doc row_number window was sorting the exploded token stream
with every row carrying its token string/struct.  r10 narrows the
window input to the (id, word_pos, word, n_symbols) WORD stream and
joins the symbol arrays back by word type.  This probe re-runs the
three affected rows (encode / total / roundtrip — the roundtrip is
the r9 verdict's item-7 ask: its decode join-back must not inherit
the sort pressure) at 64x WITHOUT raising SPARK_DRIVER_MEMORY, which
is exactly the condition that failed before.

Usage: python tools/probe_bpe64.py [sf_dir] [factors...]
(defaults: /root/testdata/sf0.1, factor 64)
Prints one row per probe; paste into SCALING.md's r10 section.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert "SPARK_DRIVER_MEMORY" not in os.environ, (
    "probe_bpe64 must run at the DEFAULT heap — unset SPARK_DRIVER_MEMORY"
)

from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table
from scale_probe import inflate, learned_subword_merges, run_once


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [64]
    spark = get_session("probe-bpe64")
    spark.sparkContext.setLogLevel("ERROR")
    heap = spark.conf.get("spark.driver.memory")
    print(f"driver heap: {heap} (must be the 8g default)")

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        bpe_subword_decode,
        bpe_subword_encode,
        bpe_subword_encode_total,
    )

    rules = learned_subword_merges(spark, sf_dir)

    # frozen vocab from the BASE table — the bpe_subword_total gate
    # recipe (scale_probe's 1/4/16 rows use the same construction);
    # the cutoff is THE gate's constant, not a copy of it
    from __spark_entry__ import _BPE_TOTAL_VOCAB

    base_enc = bpe_subword_encode(load_table(spark, sf_dir, "documents"), rules)
    vocab = [
        r["token"]
        for r in base_enc.select("token", "token_id")
        .distinct()
        .filter(f"token_id < {_BPE_TOTAL_VOCAB}")
        .orderBy("token_id")
        .collect()
    ]

    for factor in factors:
        docs = inflate(
            load_table(spark, sf_dir, "documents"), factor, ("doc_id",)
        ).localCheckpoint(eager=False)
        n = docs.count()
        probes = {
            "bpe_subword_encode(documents, 3 rules)": bpe_subword_encode(
                docs, rules
            ),
            "bpe_subword_total(documents, frozen24)": (
                bpe_subword_encode_total(docs, rules, vocab)
            ),
            "bpe_subword_roundtrip(documents)": bpe_subword_decode(
                bpe_subword_encode_total(docs, rules, vocab)
            ),
        }
        for name, df in probes.items():
            run_once(df)
            sec = run_once(df)
            print(
                f"| {name} | {factor} | {n:,} | {sec:.2f} "
                f"| {sec / (n / 1e6):.3f} |",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
