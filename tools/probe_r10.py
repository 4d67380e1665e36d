"""Focused scaling probes for the round-10 operators.

- ``normalize_text``: a pure in-scan expression chain (plan-pinned
  zero-shuffle) — the probe documents that sec/Mrow falls with volume
  (fixed codegen cost amortizing), i.e. nothing in the fold chain is
  secretly super-linear (the translate/replace chain is O(len)).
- ``lang_id_scores`` BROADCAST-LUT branch (4 x 512 buckets, past the
  literal cap): the production fastText shape — one explode + one
  broadcast join + one map-side-combinable groupBy.  The corpus-sized
  explode is the cost driver; the probe shows s/Mrow falling, the
  same discipline as the in-scan literal form's r9 rows.

Same method as scale_probe.py: inflate in-engine with per-replica key
shift, materialize off the clock, warm second run to the noop sink.

Usage: python tools/probe_r10.py [sf_dir] [factors...]
(defaults: /root/testdata/sf0.1, factors 1 4 16)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table
from scale_probe import inflate, run_once


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 4, 16]
    spark = get_session("probe-r10")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from __spark_entry__ import _LANGID_GATE_LANGS, _langid_gate_weights
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        lang_id_scores,
        normalize_text,
    )

    lut = {
        lg: _langid_gate_weights(lg, n_buckets=512)
        for lg in _LANGID_GATE_LANGS
    }
    for factor in factors:
        docs = inflate(
            load_table(spark, sf_dir, "documents"), factor, ("doc_id",)
        ).localCheckpoint(eager=False)
        n = docs.count()
        from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import normalize_text_nfkc

        probes = {
            "normalize_text(documents)": docs.select(
                "doc_id", normalize_text(F.col("text")).alias("text_norm")
            ),
            "normalize_text_nfkc(documents, arrow seam)": docs.select(
                "doc_id",
                normalize_text_nfkc(F.col("text")).alias("text_norm"),
            ),
            "lang_id_joined(documents, 4x512 LUT)": lang_id_scores(
                docs, lut
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
