"""lang_id_joined at a PRODUCTION vocabulary (r10 verdict item 5).

The gate runs the broadcast-LUT branch of ``lang_id_scores`` at
4 languages x 512 buckets — just past the literal-form switch — but a
real fastText table is 1e5-2e6 buckets x K languages.  This probe
pins the branch at 4 x 32k (and optionally 4 x 131k) buckets over
replica-salted corpus inflation 1/4/16/64, so SCALING.md gets a
falling s/Mrow curve for the wide-row broadcast join at realistic
LUT size, plus the measured broadcast payload.

What to look at:
- curve falling => the per-row cost is corpus-bound (explode + join +
  one (id, K sums) groupBy), not LUT-bound — the 100 TB property;
- LUT build/broadcast cost is a CONSTANT per query (table rows x
  (4 + 8K) bytes: ~1.2 MB at 32k x 4, ~72 MB at 2e6 x 4 — explicit
  F.broadcast hint, so the autoBroadcastJoinThreshold default never
  demotes it to a shuffle join).

Usage:  python tools/probe_langid_lut.py [sf_dir] [n_buckets] [factors...]
        (defaults: /root/testdata/sf0.01, 32768, factors 1 4 16 64)
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
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    factors = [int(a) for a in sys.argv[3:]] or [1, 4, 16, 64]

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import lang_id_scores
    from scale_probe import _probe_lang_tables, inflate_docs_salted, run_once

    spark = get_session("probe-langid-lut")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    tables = _probe_lang_tables(n_buckets=n_buckets)
    k = len(tables)
    lut_bytes = n_buckets * (4 + 8 * k)
    print(
        f"LUT: {k} langs x {n_buckets} buckets "
        f"(~{lut_bytes / 1e6:.1f} MB wide-row payload; table built "
        f"driver-side in {time.perf_counter() - t0:.1f}s)"
    )

    base = load_table(spark, sf_dir, "documents")
    print(f"{'factor':>7} {'rows':>9} {'sec':>8} {'s/Mrow':>8}")
    for factor in factors:
        docs = inflate_docs_salted(base, factor).localCheckpoint()
        n = docs.count()
        t = run_once(lang_id_scores(docs, tables))
        print(f"{factor:>7} {n:>9} {t:8.1f} {t / n * 1e6:8.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
