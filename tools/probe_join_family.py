"""As-of join and bucketed range join at scale — the join family's
two composition operators (Spark has no native ASOF/interval join;
`operators/joins.py` builds them from shuffle+window and
explode+equi-join).  The skew probe (`probe_skew_join.py`) covers
the hot-key axis; this one answers the VOLUME question for the two
custom compositions: does s/Mrow stay flat/falling as both sides
replica-inflate 1/4/16/64?

Shapes (events sf0.1 base, both sides scale with the factor — the
100 TB case; key cardinality scales via replica shift per the
scale_probe convention):

- asof_join: every event looks up the most recent prior snapshot of
  its user; snapshots = the ~10% event sample per user.  Plan under
  test: ONE shuffle on the key (union + running last over a
  (key)-partitioned window) — the naive theta-join encoding this
  replaces is O(|L|x|R|) per key and would blow up quadratically in
  this probe.
- range_join_bucketed: fact values joined to a disjoint interval
  grid over the value domain [0, 600) that gets FINER with the
  factor (10k intervals per factor unit — 640k at 64x), so the
  interval side scales with the data while every fact row still
  matches exactly one interval and the output stays O(fact).
  Fan-out is bounded by construction: bucket_width = interval
  width, so each interval explodes to <= 2 grid buckets.

Usage:  python tools/probe_join_family.py [sf_dir] [factors...]
        (defaults: /root/testdata/sf0.1, factors 1 4 16 64)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_based_real_time_air_quality_monitoring_system_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
)
from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table

KEY_SHIFT = 10_000_000_000
VALUE_DOMAIN = 600.0
INTERVALS_PER_FACTOR = 10_000


def run_min2(df) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    return min(once(), once())


def inflate_events(spark, sf_dir: str, factor: int):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    if factor == 1:
        return ev
    spine = spark.range(factor).select(F.col("id").alias("_rep"))
    return ev.crossJoin(spine).select(
        (F.col("event_id") + F.col("_rep") * KEY_SHIFT).alias("event_id"),
        (F.col("user_id") + F.col("_rep") * KEY_SHIFT).alias("user_id"),
        "ts",
        "value",
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 4, 16, 64]

    spark = get_session("probe-join-family")

    print("| operator | factor | left/fact rows | right rows | sec | s/Mrow |")
    print("|---|---|---|---|---|---|")
    for factor in factors:
        ev = inflate_events(spark, sf_dir, factor)
        n = ev.count()

        # ~10% of events per user become that user's snapshot stream
        snaps = ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(10)) == 0).select(
            "user_id",
            F.col("ts").alias("snap_ts"),
            F.col("value").alias("snap_value"),
        )
        n_snaps = snaps.count()
        j = asof_join(
            ev,
            snaps,
            key="user_id",
            left_time="ts",
            right_time="snap_ts",
            right_values=["snap_value"],
        ).select("event_id", "snap_value")
        t = run_min2(j)
        print(
            f"| asof_join(events, 10% snapshots) | {factor} | {n:,} "
            f"| {n_snaps:,} | {t:.2f} | {t / n * 1e6:.3f} |"
        )

        # disjoint grid, finer with the factor: every fact value
        # matches exactly one interval, output stays O(fact)
        n_intervals = INTERVALS_PER_FACTOR * factor
        width = VALUE_DOMAIN / n_intervals
        grid = spark.range(n_intervals).select(
            (F.col("id") * width).alias("lo"),
            (F.col("id") * width + width).alias("hi"),
            F.col("id").alias("interval_id"),
        )
        rj = range_join_bucketed(
            ev.select("event_id", "value"),
            grid,
            value="value",
            bucket_width=width,
            clamp_lo=0.0,
            clamp_hi=VALUE_DOMAIN,
        ).select("event_id", "interval_id")
        t2 = run_min2(rj)
        print(
            f"| range_join_bucketed(events, {n_intervals:,} intervals) "
            f"| {factor} | {n:,} | {n_intervals:,} | {t2:.2f} "
            f"| {t2 / n * 1e6:.3f} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
