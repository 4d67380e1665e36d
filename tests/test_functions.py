"""Unit tests for the scalar function layer (SURVEY.md §5.2):
threshold boundary values for F1/F2 CASE chains, round behavior of F7,
null propagation through F6 — the exact risk spots called out in the
reference (``spark_processor.py:89-132``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_based_real_time_air_quality_monitoring_system_spark.functions.banding import (
    aqi_band,
    temp_category,
)
from etl_based_real_time_air_quality_monitoring_system_spark.functions.scoring import (
    POLLUTION_WEIGHTS,
    pollution_score,
    weighted_score,
)
from etl_based_real_time_air_quality_monitoring_system_spark.functions.timeparts import (
    with_calendar_parts,
)


def _banded(spark, values, colfn):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r[0] for r in df.select(colfn(F.col("x"))).collect()]


def test_aqi_band_boundaries_inclusive(spark):
    # F1 uses <= : the boundary value belongs to the LOWER band
    # (spark_processor.py:91-95)
    got = _banded(spark, [0.0, 12.0, 12.01, 35.0, 35.01, 55.0, 55.01, 150.0, 150.01, 250.0, 250.01], aqi_band)
    assert got == [
        "Good", "Good",
        "Moderate", "Moderate",
        "Unhealthy for Sensitive Groups", "Unhealthy for Sensitive Groups",
        "Unhealthy", "Unhealthy",
        "Very Unhealthy", "Very Unhealthy",
        "Hazardous",
    ]


def test_temp_band_boundaries_exclusive(spark):
    # F2 uses < : the boundary value belongs to the UPPER band
    # (spark_processor.py:99-102)
    got = _banded(spark, [-5.0, 0.0, 9.99, 10.0, 19.99, 20.0, 29.99, 30.0], temp_category)
    assert got == ["Freezing", "Cold", "Cold", "Cool", "Cool", "Warm", "Warm", "Hot"]


def test_band_null_goes_to_else(spark):
    # null <= x is null -> every WHEN misses -> ELSE, in Spark and ANSI
    df = spark.createDataFrame([(None,)], "x double")
    assert df.select(aqi_band(F.col("x"))).collect()[0][0] == "Hazardous"
    assert df.select(temp_category(F.col("x"))).collect()[0][0] == "Hot"


def test_pollution_score_reference_formula(spark):
    # spark_processor.py:121-132 weights, rounded to 2dp
    row = {"pm2_5": 10.0, "pm10": 20.0, "no2": 5.0, "o3": 8.0, "co": 100.0, "so2": 2.0}
    df = spark.createDataFrame([tuple(row.values())], list(row.keys()))
    got = df.select(pollution_score().alias("s")).collect()[0]["s"]
    expected = round(sum(row[c] * w for c, w in POLLUTION_WEIGHTS.items()), 2)
    assert got == expected == 15.3


def test_weighted_score_null_propagates(spark):
    df = spark.createDataFrame([(None, 2.0)], "a double, b double")
    got = df.select(weighted_score({"a": 0.5, "b": 0.5}).alias("s")).collect()[0]["s"]
    assert got is None


def test_calendar_parts(spark):
    df = spark.createDataFrame([("2024-03-07 13:45:00",)], ["timestamp"])
    row = with_calendar_parts(df, parse_string=True).collect()[0]
    assert (row["year"], row["month"], row["day"], row["hour"]) == (2024, 3, 7, 13)


def test_rolling_fingerprint_order_sensitive(spark):
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "id long, text string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", rolling_fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[3]          # identical text -> identical hash
    assert fps[1] != fps[2]          # same tokens, different order -> different
    assert 0 <= fps[1] < 1_000_000_007
