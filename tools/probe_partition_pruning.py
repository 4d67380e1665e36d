"""Dynamic partition pruning, MEASURED on runtime scan metrics (the
third 100 TB scan-reduction lever; `test_dynamic_partition_pruning_
through_join` pins that the dynamicpruningexpression subquery
appears — this pins what it buys, in files/bytes actually scanned).

Layout: events replica-inflated, ~256B incompressible payload,
written partitioned into 50 `part_key` directories.  The dim filter
is `attr == 3 AND part_key < 8`: the `part_key < 8` half is
inferable through the equi-join and becomes a STATIC fact-side
partition filter (50 -> 8 directories, the first scan-reduction
lever working through join inference); the `attr == 3` half is on a
NON-join column, so only DPP can apply it — pruning 8 -> 1 at
runtime (exactly one of part_key 0..7 has attr==3).

Wall-clock is reported but is NOT the evidence at probe scale: the
just-written fact is fully page-cached, so the unpruned scan is
~free and the fixed join/action overhead dominates.  The evidence
is the fact scan's own runtime metrics — `numFiles`/`filesSize`
(what was read) vs `staticFilesNum`/`staticFilesSize` (what the
static filters alone would have read) — which are volume ratios
that hold at any scale.

Usage:  python tools/probe_partition_pruning.py [sf_dir] [factors...]
        (defaults: /root/testdata/sf0.1, factors 16)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table

KEY_SHIFT = 10_000_000_000
N_PARTITIONS = 50
DPP_CONF = "spark.sql.optimizer.dynamicPartitionPruning.enabled"


def fact_scan_metrics(df) -> dict:
    """File metrics of the LARGEST FileSourceScanExec in the executed
    adaptive plan (the fact side; the dim scan is KB-sized).  Walks
    through QueryStageExec wrappers — AQE's final plan nests each
    materialized stage."""
    scans: list[dict] = []

    def walk(node) -> None:
        nm = node.getClass().getSimpleName()
        if nm.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if nm == "FileSourceScanExec":
            m = node.metrics()
            ks = m.keySet().toList()
            d = {}
            for ki in range(ks.size()):
                k = ks.apply(ki)
                d[k] = m.apply(k).value()
            scans.append(d)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan().executedPlan())
    return max(
        scans, key=lambda d: d.get("staticFilesSize", d.get("filesSize", 0))
    )


def timed_collect(df) -> float:
    t0 = time.perf_counter()
    df.collect()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [16]

    spark = get_session("probe-partition-pruning")
    root = tempfile.mkdtemp(prefix="probe_dpp_")
    print(
        "| variant | factor | files read / static | bytes read / static | sec |"
    )
    print("|---|---|---|---|---|")
    try:
        for factor in factors:
            ev = load_table(spark, sf_dir, "events")
            spine = spark.range(factor).select(F.col("id").alias("_rep"))
            big = ev.crossJoin(spine).select(
                (F.col("event_id") + F.col("_rep") * KEY_SHIFT).alias(
                    "event_id"
                ),
                F.pmod(F.xxhash64("event_id"), F.lit(N_PARTITIONS)).alias(
                    "part_key"
                ),
                F.concat(
                    F.sha2(F.col("event_id").cast("string"), 512),
                    F.sha2(F.concat(F.lit("2:"), F.col("event_id")), 512),
                ).alias("payload"),
            )
            fact_path = os.path.join(root, f"fact_{factor}")
            big.write.partitionBy("part_key").mode("overwrite").parquet(
                fact_path
            )
            fact = spark.read.parquet(fact_path)

            dim_path = os.path.join(root, f"dim_{factor}")
            spark.range(N_PARTITIONS).select(
                F.col("id").alias("part_key"),
                F.pmod(F.col("id"), F.lit(7)).alias("attr"),
            ).write.mode("overwrite").parquet(dim_path)
            dim = spark.read.parquet(dim_path).filter(
                (F.col("attr") == F.lit(3)) & (F.col("part_key") < F.lit(8))
            )

            for conf, label in [
                ("false", "DPP OFF (static join-inferred filter only)"),
                ("true", "DPP ON (engine default)"),
            ]:
                spark.conf.set(DPP_CONF, conf)
                j = fact.join(dim, "part_key").select(
                    F.sum(F.length("payload")).alias("s")
                )
                sec = timed_collect(j)
                m = fact_scan_metrics(j)
                nf, fs = m.get("numFiles", 0), m.get("filesSize", 0)
                snf = m.get("staticFilesNum", nf)
                sfs = m.get("staticFilesSize", fs)
                print(
                    f"| {label} | {factor} | {nf} / {snf} "
                    f"| {fs:,} / {sfs:,} | {sec:.2f} |"
                )
    finally:
        spark.conf.set(DPP_CONF, "true")
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
