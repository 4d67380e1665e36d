"""Time-series regularization operators.

The reference's domain is an air-quality time series, but its charts
simply sort by timestamp and connect the dots (dashboard.py:98-105) —
gaps in the sensor feed silently render as straight lines.  A real
time-series engine regularizes first: snap observations to a fixed
grid, materialize the missing buckets, and carry the last observation
forward (LOCF).  This module does that as pure DataFrame algebra —
no driver loops, no UDFs.

Scale design (100 TB): the only fact-sized operation is the initial
bucketed aggregation (one partial+final hash agg).  Everything after
runs on the aggregate: the key list and the global time bounds are
broadcast, the dense spine is generated distributed via
``sequence``+``explode`` (keys × buckets rows, never fact rows), and
the LOCF window shuffles once on the series key.  Carrying the exact
decimal (sum, count) pair — rather than a pre-divided average —
keeps the filled values bit-identical across engines and lets the
division happen once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: date_trunc units accepted by gap_fill_locf; each maps to the SQL
#: interval literal used for the spine step.
_UNIT_INTERVAL = {
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 1 week",
    "minute": "interval 1 minute",
}


def bucketed_series(
    df: DataFrame, key: str, ts: str, value: str, unit: str = "hour"
) -> DataFrame:
    """Snap an irregular series to a fixed grid: one row per
    (key, bucket) holding the exact decimal sum and count of the
    observations in that bucket.  One shuffle; this is the only
    fact-sized stage of the gap-fill pipeline."""
    return df.groupBy(
        F.col(key), F.date_trunc(unit, F.col(ts)).alias("bucket_ts")
    ).agg(
        F.sum(F.col(value).cast("decimal(20,6)")).alias("_s"),
        F.count(value).alias("_c"),
    )


def gap_fill_locf(
    df: DataFrame, key: str, ts: str, value: str, unit: str = "hour"
) -> DataFrame:
    """Dense per-key time grid with last-observation-carried-forward
    interpolation of the bucket average.

    Output: (key, bucket_ts, value_locf, was_filled) — one row per key
    per grid bucket between the global min and max observed bucket.
    ``value_locf`` is the bucket's average value, or the most recent
    earlier bucket's average when the bucket is empty; buckets before
    a key's first observation stay null.  ``was_filled`` is 1 for
    materialized (previously missing) buckets.

    The average is carried as its exact (decimal sum, count) parts and
    divided only at the end — LOCF of a pre-divided float would pin
    the engine to one summation order.
    """
    step = _UNIT_INTERVAL[unit]
    series = bucketed_series(df, key, ts, value, unit)
    bounds = series.agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    keys = df.select(key).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        key,
        F.explode(F.expr(f"sequence(_lo, _hi, {step})")).alias("bucket_ts"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(series, [key, "bucket_ts"], "left")
    return joined.select(
        key,
        "bucket_ts",
        (
            F.last("_s", ignorenulls=True).over(w).cast("double")
            / F.last("_c", ignorenulls=True).over(w)
        ).alias("value_locf"),
        F.col("_s").isNull().cast("int").alias("was_filled"),
    )


def resample_ohlc(
    df: DataFrame, key: str, ts: str, value: str, unit: str = "hour"
) -> DataFrame:
    """Downsample an irregular series to per-bucket OHLC bars — open =
    value at the earliest observation in the bucket, close = at the
    latest, high/low = extremes, plus the observation count.

    ONE partial+final hash aggregate, no window: open/close are
    ``min``/``max`` over ``struct(ts, value)`` — the struct's
    lexicographic order is total, so boundary ties (several
    observations sharing the bucket's first/last timestamp) resolve
    identically in any engine, keeping the bars oracle-exact.  NULL
    values are excluded (an empty bucket simply has no bar — compose
    with ``gap_fill_locf`` to materialize it)."""
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}, got {unit!r}")
    v = F.col(value)
    pair = F.struct(F.col(ts).alias("t"), v.alias("v"))
    return (
        df.filter(v.isNotNull())
        .groupBy(F.col(key), F.date_trunc(unit, F.col(ts)).alias("bucket"))
        .agg(
            F.min(pair)["v"].alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max(pair)["v"].alias("close"),
            F.count(v).alias("n_obs"),
        )
    )
