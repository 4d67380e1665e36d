"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the ``noop`` sink (full compute,
no driver collect, no disk write) so the number is engine time, not
materialization time.  A warmup query first touches every input file so
JVM/codegen startup isn't billed to the first query.

NOTE on the printed line's per-query map (r13, after the r12 PERF
misread): the stdout line is SIZE-CAPPED (~1800 B — the driver records
only a ~2000-byte stdout tail) and keeps the SLOWEST queries,
folding the rest into ``queries_omitted``/``omitted_sec``.  Which
queries make the printed cut therefore CHURNS round-to-round as
relative speeds shift — a query missing from the printed map is NOT
dropped from the bench (the driver's ``dropped_from_bench`` diff reads
this way every round).  ``n_queries`` counts every query actually run;
the COMPLETE map is written to ``$BENCH_OUT`` and committed as
``BENCH_LOCAL_r{N}_full*.json`` — diff those, not the stdout tail.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session

#: queries() subset benchmarked per-round; keep headline-worthy ones.
HEADLINE = [
    "flagship",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q15",
    "tpch_q17",
    "tpch_q18",
    "tpch_q22",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q16",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "grouped_stats",
    "multikey_summary",
    "hourly_activity",
    "latest_event_per_type",
    "top_orders",
    "weighted_score",
    "props_k_stats",
    "join_star_region",
    "running_user_value",
    "value_rankings",
    "moving_sum_user_value",
    "trailing_hour_count",
    "sliding_window_counts",
    "rollup_flag_status",
    "grouping_sets_qty",
    "asof_purchase_attribution",
    "gapfill_hourly_locf",
    "order_snapshot_diff",
    "user_sessions",
    "session_window_stats",
    "value_percentiles",
    "range_band_join",
    "text_stats",
    "top_tokens",
    "dq_report",
    "corpus_filter",
    "corpus_pipeline",
    "doc_chunks",
    "tfidf_terms",
    "stratified_sample",
    "group_split",
    "stratified_quota_sample",
    "zscore_outliers",
    "doc_fingerprints",
    "levenshtein_near_dup",
    "minhash_pairs",
    "dedup_clusters",
    "fuzzy_dedup_corpus",
    "ngram_jaccard",
    "simhash",
    "embedding_topk",
    "knn_join",
    "ivf_topk",
    "embedding_near_dup_gemm",
    "nn_label_confusion",
    "multimodal_decode",
    "simhash_near_dup",
    "air_quality_summary",
    "sink_partitioned_roundtrip",
    "sink_bucketed_join",
    "sink_csv_roundtrip",
    "http_ingest_simulated",
    "json_scan_roundtrip",
    "ingest_metrics_passthrough",
    "cache_fanout",
    "dead_letter_split",
    "streaming_to_table_roundtrip",
    "pii_redaction",
    "repetition_stats",
    "sequence_packing",
    "cdc_merge_upsert",
    "scd2_user_history",
    "point_in_time_features",
    "benchmark_contamination",
    "funnel_conversion",
    "retention_cohorts",
    "mad_outliers",
    "corpus_datacard",
    "event_transitions",
    # round-3 session-2 additions
    "gopher_quality",
    "token_cooccurrence",
    "passage_dedup",
    "dedup_keep_best",
    "drift_report",
    "equi_depth_bins",
    "sketch_profile",
    "ngram_containment",
    "key_skew_report",
    "sink_orc_roundtrip",
    "lsh_rescore_tfidf",
    "table_profile",
    "path_trigrams",
    "streaming_sliding_counts",
    "asof_time_to_convert",
    "corpus_pipeline_fuzzy",
    "label_centroids",
    "multimodal_frames",
    "multimodal_resized",
    "grouped_deciles",
    "running_distinct_types",
    "dedup_graph_stats",
    "oov_rate",
    "range_band_join_bucketed",
    "incremental_dedup",
    "cluster_safe_split",
    "schema_evolution_roundtrip",
    # round-4 additions
    "ngram_jaccard_capped",
    "mixture_sample",
    "token_budget_prefix",
    "sink_sharded_export",
    "corpus_assembly",
    "embedding_gram",
    "hourly_ohlc",
    "streaming_cdc_apply",
    "zorder_cells",
    # round-5 additions
    "zorder_pruning",
    "streaming_late_data_drop",
    "cdc_time_travel",
    "ivf_topk_recall",
    "funnel_over_cdc",
    # round-6 additions
    "lsh_topk_recall",
    "sketch_bounds",
    "nn_confusion_ivfpq",
    "cdc_vacuum",
    "bpe_merges",
    # round-7 additions
    "bpe_encode",
    "quality_classifier",
    "domain_rollup",
    "nn_confusion_ivfpq_stored",
    "cluster_balanced_sample",
    # round-8 additions
    "bpe_subword_encode",
    "domain_capped_sample",
    "blocklist_filter_df",
    "streaming_ivfpq_index",
    "bm25_search",
    "line_dedup",
    "substring_rewrite",
    # round-9 additions
    "lang_id",
    "bpe_subword_total",
    "bpe_roundtrip",
    # round-10 additions
    "normalize_text",
    "lang_id_joined",
    # round-11 additions
    "normalize_text_nfkc",
    "normalize_text_nfkc_agree",
    "corpus_pipeline_normalized",
]


def run_once(df) -> float:
    # Timed region: the noop-write ACTION on the already-built frame.
    # DataFrame construction is excluded — for most queries that is
    # plan building only, but the BPE gates' merge LEARNING (bounded
    # 1-row argmax collects, documented per query) also runs at build
    # time.  Cross-round comparisons stay valid because the region
    # has been identical since r1; isolated probes that time
    # build+action will read higher than in-suite numbers
    # (BENCH_NOTES.md r11 close-out).
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE and os.environ.get("BENCH_ALL")
    ]
    # warmup: flagship at the bench SF primes file listing + codegen
    run_once(qs[names[0]](spark, sf_dir))
    # BENCH_WARM=1: time each query twice and report the min — removes
    # per-query codegen/JIT noise (±20% run-to-run on cold timings) for
    # regression comparisons; the driver's default protocol stays cold
    warm = os.environ.get("BENCH_WARM", "").lower() not in ("", "0", "false")
    # BENCH_GC=N: force a JVM GC every N queries (off by default; the
    # driver's protocol stays untouched).  Diagnostic for the
    # sustained-suite slowdown hypothesis: a 216-query suite in one
    # JVM accumulates localCheckpoint blocks + broadcasts that are
    # only freed when the JVM GC collects their Python-side-dead
    # references.  MEASURED r10: BENCH_GC=20 made the suite ~27%
    # SLOWER (180 vs 142 s) — full System.gc() pauses cost more than
    # any storage pressure they relieve; the in-suite drift is the
    # machine's sustained-load envelope, not reclaimable state.  Keep
    # off; the knob stays for future epochs' diagnostics.
    gc_every = int(os.environ.get("BENCH_GC", "0") or 0)
    timings: dict[str, float] = {}
    for i, name in enumerate(names):
        t = run_once(qs[name](spark, sf_dir))
        if warm:
            t = min(t, run_once(qs[name](spark, sf_dir)))
        timings[name] = round(t, 3)
        if gc_every and (i + 1) % gc_every == 0:
            spark._jvm.System.gc()
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": timings,
    }
    # BENCH_OUT: also write the COMPLETE per-query map to a file (for
    # local regression baselines, which need every entry)
    out_path = os.environ.get("BENCH_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(full, fh)
            fh.write("\n")
    # The driver records only the TAIL of stdout — measured at exactly
    # 2000 bytes in round 7 (BENCH_r07.json "tail" length; the r6
    # estimate of ~3.6 KB was too generous, so the 2800-byte cap still
    # shipped "parsed": null).  A longer line loses its HEAD — which
    # holds metric/value — and fails to parse.  Cap the stdout line
    # comfortably under 2000: keep the slowest queries (the ones worth
    # reading) at 2 decimals, fold the rest into
    # queries_omitted/omitted_sec.  Totals stay FIRST in the payload.
    cap = int(os.environ.get("BENCH_LINE_CAP", "1800"))
    payload = dict(full)
    payload["queries"] = {k: round(v, 2) for k, v in timings.items()}
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > cap:
        by_cost = sorted(timings, key=timings.get, reverse=True)
        keep = len(by_cost)
        while keep > 0:
            kept = {n: round(timings[n], 2) for n in by_cost[:keep]}
            omitted = by_cost[keep:]
            payload = {
                "metric": full["metric"],
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries_omitted": len(omitted),
                "omitted_sec": round(sum(timings[n] for n in omitted), 3),
                "queries": kept,
            }
            line = json.dumps(payload, separators=(",", ":"))
            if len(line) <= cap:
                break
            keep -= max(1, keep // 10)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
