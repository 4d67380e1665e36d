"""Skew-join mitigation, MEASURED (closing the one 100 TB lever whose
evidence was plan-shape only).

The engine claims three answers to a hot join key (`operators/
joins.py`): AQE skew-join splitting at runtime (default on),
explicit `salted_join` for the cases AQE can't fix, and broadcast
when one side is small (which sidesteps the problem entirely — this
probe FORCES the shuffle-join path, the 100 TB case where the right
side is too big to broadcast).  `test_aqe_skew_join_split_fires_and_
its_limit` pins WHEN the split happens; this probe pins WHAT IT
BUYS: wall-clock for a planted-90%-hot-key join at replica-inflated
volumes, with AQE skew OFF (the straggler baseline), AQE skew ON,
and `salted_join`.

Skew thresholds are scaled to probe data (8MB/4MB vs the 256MB/64MB
production defaults) so the split engages at every factor — the
mechanism under test is the split, not the threshold.  A final
64x row re-runs AQE-ON at FULL PRODUCTION DEFAULTS: by then the hot
partition (~1.2 GB) exceeds the default 256MB threshold, so the
default config fires unaided — the 100 TB property, demonstrated at
probe scale.

Usage:  python tools/probe_skew_join.py [sf_dir] [factors...]
        (defaults: /root/testdata/sf0.1, factors 1 4 16 64)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_based_real_time_air_quality_monitoring_system_spark.operators.joins import salted_join
from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table

KEY_SHIFT = 10_000_000_000
HOT_SHARE_MOD = 10  # pmod < 9 of 10 -> ~90% of rows on the hot key
N_SALTS = 32


def run_once(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def run_min2(df) -> float:
    return min(run_once(df), run_once(df))


def build_sides(spark, sf_dir: str, factor: int):
    """Planted-skew fact + frozen dim at the given inflation factor:
    ~90% of fact rows land on key 0, the rest keep distinct
    replica-shifted keys (so dim cardinality scales with the data,
    per the scale_probe inflation convention)."""
    ev = load_table(spark, sf_dir, "events")
    spine = spark.range(factor).select(F.col("id").alias("_rep"))
    shifted = (F.col("event_id") + F.col("_rep") * KEY_SHIFT).alias(
        "event_id"
    )
    fact = ev.crossJoin(spine).select(
        shifted,
        F.when(
            F.pmod(F.xxhash64("event_id"), F.lit(HOT_SHARE_MOD))
            < HOT_SHARE_MOD - 1,
            F.lit(0),
        )
        .otherwise(F.col("event_id") + F.col("_rep") * KEY_SHIFT)
        .alias("k"),
        # INCOMPRESSIBLE ~256B payload (two chained sha2-512 hex
        # digests): AQE's skew detection operates on COMPRESSED
        # shuffle-partition bytes, so a constant-fill payload (an
        # earlier cut used rpad 'x', ~100x compressible) hides the
        # hot partition from the PRODUCTION 256MB threshold at any
        # probe-reachable volume — real text doesn't compress like
        # that, and neither does this
        F.concat(
            F.sha2(F.col("event_id").cast("string"), 512),
            F.sha2(F.concat(F.lit("2:"), F.col("event_id")), 512),
        ).alias("payload"),
    )
    # freeze the dim so every variant joins the identical input and
    # its (distinct) build cost stays out of the timed region
    dim = (
        fact.select("k")
        .distinct()
        .withColumn("attr", F.pmod(F.col("k"), F.lit(97)))
        .localCheckpoint()
    )
    return fact, dim


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 4, 16, 64]

    spark = get_session("probe-skew-join")
    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    print(
        "| variant | factor | fact rows | hot rows | sec (min of 2) |"
    )
    print("|---|---|---|---|---|")
    for factor in factors:
        fact, dim = build_sides(spark, sf_dir, factor)
        n = fact.count()
        hot = fact.filter(F.col("k") == 0).count()

        def joined(df=fact):
            return df.join(dim, "k").select(
                F.length("payload").alias("lp"), "attr"
            )

        # scaled thresholds: the split mechanism engages at probe size
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8MB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_off = run_min2(joined())
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t_on = run_min2(joined())
        t_salt = run_min2(
            salted_join(
                fact,
                dim,
                left_key="k",
                right_key="k",
                salt_from="event_id",
                n_salts=N_SALTS,
            ).select(F.length("payload").alias("lp"), "attr")
        )
        for name, sec in [
            ("smj skew-split OFF (straggler baseline)", t_off),
            ("smj skew-split ON (scaled thresholds)", t_on),
            (f"salted_join n_salts={N_SALTS}", t_salt),
        ]:
            print(f"| {name} | {factor} | {n:,} | {hot:,} | {sec:.2f} |")

        if factor >= 64:
            # production defaults: hot partition ~1.2 GB > 256MB
            # default threshold -> the split fires unaided
            conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
            t_def = run_min2(joined())
            print(
                f"| smj skew-split ON (PRODUCTION default thresholds) "
                f"| {factor} | {n:,} | {hot:,} | {t_def:.2f} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
