"""The flagship end-to-end plan (SURVEY.md §7 Phase 1).

Mirrors the reference's core batch pipeline shape
(``spark_processor.py:83-96`` + ``:157-170``):

    scan -> dropDuplicates (P1) -> not-null filters (P2)
         -> CASE band (F1) -> groupBy stats (A1) -> order (O1)

applied to the driver's ``events`` table: ``event_type`` stands in for
``location`` (group key) and ``value`` for ``pm2_5`` (banding + stats
target) per FIXTURES.md §3.

Plan-shape notes (verified via ``.explain("formatted")``):
- the not-null predicates push into the parquet scan,
- dedup + aggregation are partial/final HashAggregates around one
  Exchange each; at 100 TB the dedup shuffle dominates, which is why
  the dedup key set is a parameter (subset dedup shuffles narrower
  rows than full-row dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.banding import aqi_band
from ..operators.cleaning import drop_null_rows, exact_dedup
from ..sources.readers import load_table


def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> clean -> band -> per-(type, band) stats, largest groups
    first.  Column names are shared with oracle_sql()['flagship']."""
    events = load_table(spark, sf_dir, "events")
    clean = drop_null_rows(
        exact_dedup(events), ["event_type", "ts", "value"]
    )
    banded = clean.withColumn("band", aqi_band("value"))
    # avg via decimal sum / count: a float avg is summation-order-
    # sensitive, and on small groups the last ulp can sit exactly on a
    # round() boundary (observed at sf0.001) — the decimal sum is exact
    # and associative, so the pre-round quotient is bit-identical in
    # any engine
    exact_avg = (
        F.sum(F.col("value").cast("decimal(20,6)")).cast("double") / F.count("*")
    )
    return (
        banded.groupBy("event_type", "band")
        .agg(
            F.round(exact_avg, 2).alias("avg_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.count("*").alias("record_count"),
        )
        .orderBy(F.desc("record_count"), "event_type", "band")
    )
