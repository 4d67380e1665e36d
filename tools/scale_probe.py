"""Measured scaling curves for representative operators.

Correctness runs at small SF; this probe answers the 100 TB question
the tests can't: does wall-clock grow ~linearly with input volume for
each operator class, or does some plan hide a super-linear term?

Method: inflate the driver tables in-engine (cross join with a
replication spine; keys are shifted per replica so cardinalities scale
with the data instead of collapsing onto the same keys), run each
probe operator end-to-end into the noop sink at replication factors
1/4/16, and report sec and sec-per-million-rows.  A scale-safe plan
shows roughly FLAT sec-per-Mrow as the factor grows (within codegen
noise); a super-linear operator shows it climbing.

Usage: python tools/scale_probe.py [sf_dir] [factors ...]
Writes SCALING.md at the repo root.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table

KEY_SHIFT = 10_000_000_000


def inflate(df: DataFrame, factor: int, shift_cols: tuple[str, ...]) -> DataFrame:
    """factor copies of df, id-like columns shifted per replica so key
    cardinality scales with volume (no artificial hot keys)."""
    if factor == 1:
        return df
    spine = df.sparkSession.range(factor).select(F.col("id").alias("_rep"))
    out = df.crossJoin(spine)
    for c in shift_cols:
        out = out.withColumn(c, F.col(c) + F.col("_rep") * F.lit(KEY_SHIFT))
    return out.drop("_rep")


def run_once(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probes(spark, sf_dir: str, factor: int) -> dict[str, tuple[DataFrame, int]]:
    """name -> (result DataFrame, input rows) per operator class."""
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import exact_text_dedup
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.windows import sessionize

    events = inflate(
        load_table(spark, sf_dir, "events"), factor, ("event_id", "user_id")
    )
    docs = inflate(load_table(spark, sf_dir, "documents"), factor, ("doc_id",))
    orders = inflate(
        load_table(spark, sf_dir, "orders"), factor, ("o_orderkey", "o_custkey")
    )
    customer = inflate(load_table(spark, sf_dir, "customer"), factor, ("c_custkey",))
    n_events = events.count()
    n_docs = docs.count()
    n_orders = orders.count()

    agg = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(20,6)")).alias("s"),
    )
    win = sessionize(events, "user_id", "ts", gap_seconds=14400, order_tie_break="event_id")
    join = orders.join(customer, orders.o_custkey == customer.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.count("*").alias("n"))
    dedup = exact_text_dedup(docs, "doc_id", "text")
    tokens = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(50)
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import (
        drift_bin_report,
        equi_depth_bins,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import passage_dup_stats
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.funnel import path_trigrams
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import gopher_quality_flags

    gopher = gopher_quality_flags(docs)
    passages = passage_dup_stats(docs, k=8)
    deciles = equi_depth_bins(events, "value", "event_id", n_bins=10)
    trigrams = path_trigrams(events, top_n=20)
    drift = drift_bin_report(events, "ts", "value", bin_width=50.0, n_bins=10)
    return {
        "hash_aggregate(events)": (agg, n_events),
        "session_window(events)": (win, n_events),
        "shuffle_join+agg(orders x customer)": (join, n_orders),
        "exact_text_dedup(documents)": (dedup, n_docs),
        "wordcount_topk(documents)": (tokens, n_docs),
        "gopher_quality_flags(documents)": (gopher, n_docs),
        "passage_dup_stats(documents)": (passages, n_docs),
        "equi_depth_bins(events)": (deciles, n_events),
        "path_trigrams(events)": (trigrams, n_events),
        "drift_bin_report(events)": (drift, n_events),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 4, 16]
    spark = get_session("scale-probe")
    rows: list[tuple[str, int, int, float, float]] = []
    for factor in factors:
        for name, (df, n_in) in probes(spark, sf_dir, factor).items():
            run_once(df)  # warm: codegen + file listing off the clock
            sec = run_once(df)
            per_mrow = sec / (n_in / 1e6)
            rows.append((name, factor, n_in, sec, per_mrow))
            print(f"x{factor:>2} {name:38s} {n_in:>10,} rows {sec:7.2f}s "
                  f"{per_mrow:7.3f} s/Mrow", flush=True)
    out = [
        "# SCALING — measured operator scaling curves",
        "",
        "Generated by `tools/scale_probe.py`: driver tables inflated",
        "in-engine (replication spine, per-replica key shift so",
        "cardinality scales with volume), each probe run end-to-end to",
        "the noop sink, WARM timing (second run).  A scale-safe plan",
        f"keeps sec-per-Mrow ~flat as volume grows.  Base: `{sf_dir}`.",
        "",
        "| operator | factor | input rows | sec | sec/Mrow |",
        "|---|---|---|---|---|",
    ]
    for name, factor, n_in, sec, per_mrow in rows:
        out.append(f"| {name} | {factor} | {n_in:,} | {sec:.2f} | {per_mrow:.3f} |")
    out.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
