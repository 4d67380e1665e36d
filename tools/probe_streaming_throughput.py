"""Streaming ingest throughput, measured end-to-end — the surface the
reference actually ships (Kafka poll -> per-record HDFS file,
`data_ingestion/consumer.py:143,66-77`) and the one axis with no
SCALING.md row until now.

The reference's config-derived envelope is ~1 record / 10 s
(BASELINE.md: `time.sleep(10)` producer, 5 s poll batches, one HDFS
file + 2 subprocess forks per record on the alt sink).  This probe
drives THIS engine's replacement chain end-to-end — schema-enforced
file-source stream (the Kafka stand-in, same downstream plan) ->
permissive dead-letter split -> processing-time enrich ->
checkpointed foreachBatch partitioned-parquet sink
(`streaming/pipeline.py:80,93,126,305`) — over pre-generated
JSON-envelope files, split into multiple micro-batches
(maxFilesPerTrigger), and reports sustained records/sec including
sink commit + checkpoint overhead.

1% of generated payloads are CORRUPT (truncated JSON) so the
dead-letter branch does real work — throughput numbers with the
error path disabled would overstate the pipeline.

Usage:  python tools/probe_streaming_throughput.py [sf_dir] [factors...]
        (defaults: /root/testdata/sf0.1, factors 1 4 16)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, types as T

from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table
from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
    dead_letter_split,
    enrich,
    run_to_partitioned_parquet,
    stream_json_records,
)

KEY_SHIFT = 10_000_000_000
N_FILES = 20
MAX_FILES_PER_TRIGGER = 4  # -> 5 micro-batches per run
CORRUPT_MOD = 100  # ~1% of payloads truncated

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
ENVELOPE_SCHEMA = T.StructType([T.StructField("payload", T.StringType())])


def generate_files(spark, sf_dir: str, factor: int, dest: str) -> int:
    """JSON-envelope source files (untimed): each line is
    {"payload": "<json record>"}, ~1% of payloads truncated."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    if factor > 1:
        spine = spark.range(factor).select(F.col("id").alias("_rep"))
        ev = ev.crossJoin(spine).select(
            (F.col("event_id") + F.col("_rep") * KEY_SHIFT).alias("event_id"),
            (F.col("user_id") + F.col("_rep") * KEY_SHIFT).alias("user_id"),
            "event_type",
            "value",
        )
    payload = F.to_json(
        F.struct("event_id", "user_id", "event_type", "value")
    )
    corrupt = F.pmod(F.xxhash64("event_id"), F.lit(CORRUPT_MOD)) == 0
    env = ev.select(
        F.when(
            corrupt, F.substring(payload, 1, 10)
        )
        .otherwise(payload)
        .alias("payload")
    )
    n = env.count()
    env.repartition(N_FILES).write.mode("overwrite").json(dest)
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 4, 16]

    spark = get_session("probe-streaming-throughput")
    root = tempfile.mkdtemp(prefix="probe_stream_")
    print(
        "| factor | records | micro-batches | sec | records/sec | vs reference (~0.1 rec/s) |"
    )
    print("|---|---|---|---|---|---|")
    try:
        for factor in factors:
            src = os.path.join(root, f"src_{factor}")
            out = os.path.join(root, f"out_{factor}")
            ckpt = os.path.join(root, f"ckpt_{factor}")
            n = generate_files(spark, sf_dir, factor, src)

            raw = stream_json_records(
                spark,
                src,
                ENVELOPE_SCHEMA,
                max_files_per_trigger=MAX_FILES_PER_TRIGGER,
            )
            good, bad = dead_letter_split(raw, "payload", RECORD_SCHEMA)
            t0 = time.perf_counter()
            q = run_to_partitioned_parquet(
                enrich(good),
                out,
                ckpt,
                partition_cols=("event_type",),
                available_now=True,
            )
            q.awaitTermination()
            sec = time.perf_counter() - t0

            n_good = spark.read.parquet(out).count()
            n_bad = n - n_good
            assert n_bad > 0, "corrupt branch never exercised"
            batches = (N_FILES + MAX_FILES_PER_TRIGGER - 1) // MAX_FILES_PER_TRIGGER
            print(
                f"| {factor} | {n:,} ({n_bad:,} dead-lettered) | {batches} "
                f"| {sec:.2f} | {n / sec:,.0f} | {n / sec / 0.1:,.0f}x |"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
