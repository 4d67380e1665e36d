"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (SURVEY.md §7 Phase 1) on
sf0.001.  ``queries()`` exposes every implemented operator from
SURVEY.md §2 as a named (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` carries the DuckDB-ANSI twin for the driver's
differential gate.  Column names are aliased identically on both sides
(the driver hashes values under name-sorted columns).

Implementation lives in ``etl_based_real_time_air_quality_monitoring_system_spark/`` — this module only wires
the library to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_based_real_time_air_quality_monitoring_system_spark.functions.banding import (
    AQI_BANDS,
    AQI_ELSE,
    TEMP_BANDS,
    TEMP_ELSE,
    band,
    band_case_sql,
)
from etl_based_real_time_air_quality_monitoring_system_spark.functions.scoring import weighted_score
from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import (
    count_distinct,
    freq_distribution,
    global_means,
    grouped_stats,
    multikey_summary,
    range_aggregate,
    time_bucketed,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.cleaning import (
    drop_null_rows,
    exact_dedup,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.topk import (
    latest_per_key,
    top_k,
)
from etl_based_real_time_air_quality_monitoring_system_spark.plans.flagship import (
    flagship_pipeline,
)
from etl_based_real_time_air_quality_monitoring_system_spark.session import prepare
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table

# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    prepare(spark)
    return flagship_pipeline(spark, "/root/testdata/sf0.001")


# ------------------------------------------------------------- helpers

_AQI_CASE = band_case_sql("value", AQI_BANDS, AQI_ELSE, inclusive=True)
_TEMP_CASE = band_case_sql("value", TEMP_BANDS, TEMP_ELSE, inclusive=False)
#: DuckDB reads events.ts as TIMESTAMP_NS; cast to micros to match the
#: engine's nanosAsLong -> timestamp_micros read path (sources.readers).
_TS = "CAST(ts AS TIMESTAMP)"

_SCORE_WEIGHTS = {
    "l_quantity": 0.3,
    "l_extendedprice": 0.25,
    "l_discount": 0.2,
    "l_tax": 0.15,
    "l_linenumber": 0.05,
    "l_suppkey": 0.05,
}
_SCORE_SQL = " + ".join(f"{c} * {w}" for c, w in _SCORE_WEIGHTS.items())


# ------------------------------------------------------------- queries

def _q_grouped_stats(spark: SparkSession, sf: str) -> DataFrame:
    # A1 (spark_processor.py:157-163): per-key avg/min/max/count
    return grouped_stats(load_table(spark, sf, "lineitem"), "l_returnflag", "l_quantity")


def _q_band_distribution(spark: SparkSession, sf: str) -> DataFrame:
    # A2+F1 (spark_processor.py:167-170, :91-95): AQI-band frequency
    events = load_table(spark, sf, "events")
    return freq_distribution(events, band("value", AQI_BANDS, AQI_ELSE), alias="band")


def _q_global_means(spark: SparkSession, sf: str) -> DataFrame:
    # A3 (spark_processor.py:174-180): grand averages, one pass
    return global_means(
        load_table(spark, sf, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _q_hourly_activity(spark: SparkSession, sf: str) -> DataFrame:
    # A4 (spark_processor.py:184-189): hour-bucketed count + avg
    return time_bucketed(load_table(spark, sf, "events"), "ts", ["value"], bucket="hour")


def _q_multikey_summary(spark: SparkSession, sf: str) -> DataFrame:
    # A5 (spark_processor.py:210-217): persisted summary aggregate
    return multikey_summary(
        load_table(spark, sf, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


def _q_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # A7 (dashboard.py:181): exact distinct count
    return count_distinct(load_table(spark, sf, "customer"), "c_mktsegment")


def _q_acctbal_range(spark: SparkSession, sf: str) -> DataFrame:
    # A9 (dashboard.py:334): max-min spread
    return range_aggregate(load_table(spark, sf, "customer"), "c_acctbal")


def _q_priority_counts(spark: SparkSession, sf: str) -> DataFrame:
    # A10 (dashboard.py:281): value_counts
    return freq_distribution(load_table(spark, sf, "orders"), "o_orderpriority")


def _q_latest_event_per_type(spark: SparkSession, sf: str) -> DataFrame:
    # A11 (dashboard.py:266): latest reading per key via row_number()=1
    latest = latest_per_key(
        load_table(spark, sf, "events"), "event_type", "ts", tie_break="event_id"
    )
    return latest.select(
        "event_type",
        F.unix_micros("ts").alias("event_time_us"),
        "value",
        "event_id",
    )


def _q_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    # O5 (dashboard.py:343-357): deterministic top-k -> TakeOrderedAndProject
    top = top_k(
        load_table(spark, sf, "orders"), ["o_totalprice"], 50, tie_break="o_orderkey"
    )
    return top.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


def _q_price_bands(spark: SparkSession, sf: str) -> DataFrame:
    # F1-style inclusive CASE chain on a different column/threshold set
    orders = load_table(spark, sf, "orders")
    bands = ((50_000, "low"), (150_000, "mid"), (300_000, "high"))
    return freq_distribution(
        orders, band("o_totalprice", bands, "extreme", inclusive=True), alias="price_band"
    )


def _q_value_temp_bands(spark: SparkSession, sf: str) -> DataFrame:
    # F2 exclusive < chain (spark_processor.py:99-102), boundaries exact
    events = load_table(spark, sf, "events")
    return freq_distribution(
        events, band("value", TEMP_BANDS, TEMP_ELSE, inclusive=False), alias="temp_band"
    )


def _q_calendar_parts(spark: SparkSession, sf: str) -> DataFrame:
    # F5 (spark_processor.py:107-119): calendar decomposition + count
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy(
            F.year("l_shipdate").alias("year"),
            F.month("l_shipdate").alias("month"),
        )
        .agg(F.count("*").alias("record_count"))
    )


def _q_weighted_score(spark: SparkSession, sf: str) -> DataFrame:
    # F6+F7 (spark_processor.py:121-132): weighted linear score
    li = load_table(spark, sf, "lineitem").withColumn(
        "score", weighted_score(_SCORE_WEIGHTS, scale=2)
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("score"), 2).alias("avg_score"),
        F.round(F.max("score"), 2).alias("max_score"),
        F.count("*").alias("record_count"),
    )


def _q_props_k_stats(spark: SparkSession, sf: str) -> DataFrame:
    # F9+P6 (producer.py:73-89): JSON field extraction, then aggregate
    events = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("record_count"),
        )
    )


def _q_high_value_events(spark: SparkSession, sf: str) -> DataFrame:
    # P3 projection + pushed-down predicate
    events = load_table(spark, sf, "events")
    return events.filter(F.col("value") > 200).select("event_id", "event_type", "value")


def _q_member_filter(spark: SparkSession, sf: str) -> DataFrame:
    # P8 (dashboard.py:349-352): membership predicate then counts
    events = load_table(spark, sf, "events")
    return (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count("*").alias("record_count"))
    )


def _q_distinct_user_event(spark: SparkSession, sf: str) -> DataFrame:
    # P1 subset dedup (spark_processor.py:83, scale variant)
    events = load_table(spark, sf, "events")
    return exact_dedup(events.select("user_id", "event_type"))


def _q_notnull_count(spark: SparkSession, sf: str) -> DataFrame:
    # P2 (spark_processor.py:84-86): not-null conjunction
    events = load_table(spark, sf, "events")
    clean = drop_null_rows(events, ["event_type", "ts", "value"])
    return clean.agg(F.count("*").alias("clean_rows"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "flagship": flagship_pipeline,
        "grouped_stats": _q_grouped_stats,
        "band_distribution": _q_band_distribution,
        "global_means": _q_global_means,
        "hourly_activity": _q_hourly_activity,
        "multikey_summary": _q_multikey_summary,
        "count_distinct": _q_count_distinct,
        "acctbal_range": _q_acctbal_range,
        "priority_counts": _q_priority_counts,
        "latest_event_per_type": _q_latest_event_per_type,
        "top_orders": _q_top_orders,
        "price_bands": _q_price_bands,
        "value_temp_bands": _q_value_temp_bands,
        "calendar_parts": _q_calendar_parts,
        "weighted_score": _q_weighted_score,
        "props_k_stats": _q_props_k_stats,
        "high_value_events": _q_high_value_events,
        "member_filter": _q_member_filter,
        "distinct_user_event": _q_distinct_user_event,
        "notnull_count": _q_notnull_count,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI twins, column-name-aligned with ``queries()``."""
    return {
        "flagship": f"""
            WITH deduped AS (SELECT DISTINCT * FROM events),
            clean AS (
                SELECT * FROM deduped
                WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
            ),
            banded AS (SELECT event_type, {_AQI_CASE} AS band, value FROM clean)
            SELECT event_type, band,
                   round(avg(value), 2) AS avg_value,
                   round(min(value), 2) AS min_value,
                   round(max(value), 2) AS max_value,
                   count(*) AS record_count
            FROM banded GROUP BY event_type, band
        """,
        "grouped_stats": """
            SELECT l_returnflag,
                   round(avg(l_quantity), 2) AS avg_l_quantity,
                   round(min(l_quantity), 2) AS min_l_quantity,
                   round(max(l_quantity), 2) AS max_l_quantity,
                   count(*) AS record_count
            FROM lineitem GROUP BY l_returnflag
        """,
        "band_distribution": f"""
            SELECT {_AQI_CASE} AS band, count(*) AS "count"
            FROM events GROUP BY 1
        """,
        "global_means": """
            SELECT round(avg(l_quantity), 2) AS avg_l_quantity,
                   round(avg(l_extendedprice), 2) AS avg_l_extendedprice,
                   round(avg(l_discount), 2) AS avg_l_discount,
                   round(avg(l_tax), 2) AS avg_l_tax
            FROM lineitem
        """,
        "hourly_activity": f"""
            SELECT hour({_TS}) AS hour,
                   count(*) AS record_count,
                   round(avg(value), 2) AS avg_value
            FROM events GROUP BY 1
        """,
        "multikey_summary": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS record_count,
                   round(avg(l_quantity), 2) AS avg_l_quantity,
                   round(avg(l_extendedprice), 2) AS avg_l_extendedprice,
                   round(avg(l_discount), 2) AS avg_l_discount
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "count_distinct": """
            SELECT count(DISTINCT c_mktsegment) AS distinct_c_mktsegment FROM customer
        """,
        "acctbal_range": """
            SELECT max(c_acctbal) - min(c_acctbal) AS range_c_acctbal,
                   max(c_acctbal) AS max_c_acctbal,
                   min(c_acctbal) AS min_c_acctbal
            FROM customer
        """,
        "priority_counts": """
            SELECT o_orderpriority, count(*) AS "count"
            FROM orders GROUP BY o_orderpriority
        """,
        "latest_event_per_type": f"""
            SELECT event_type, epoch_us({_TS}) AS event_time_us, value, event_id
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY event_type ORDER BY ts DESC, event_id DESC
                ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
        """,
        "price_bands": """
            SELECT CASE WHEN o_totalprice <= 50000 THEN 'low'
                        WHEN o_totalprice <= 150000 THEN 'mid'
                        WHEN o_totalprice <= 300000 THEN 'high'
                        ELSE 'extreme' END AS price_band,
                   count(*) AS "count"
            FROM orders GROUP BY 1
        """,
        "value_temp_bands": f"""
            SELECT {_TEMP_CASE} AS temp_band, count(*) AS "count"
            FROM events GROUP BY 1
        """,
        "calendar_parts": """
            SELECT year(l_shipdate) AS year, month(l_shipdate) AS month,
                   count(*) AS record_count
            FROM lineitem GROUP BY 1, 2
        """,
        "weighted_score": f"""
            WITH scored AS (
                SELECT l_returnflag, round({_SCORE_SQL}, 2) AS score FROM lineitem
            )
            SELECT l_returnflag,
                   round(avg(score), 2) AS avg_score,
                   round(max(score), 2) AS max_score,
                   count(*) AS record_count
            FROM scored GROUP BY l_returnflag
        """,
        "props_k_stats": """
            SELECT event_type,
                   round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                   count(*) AS record_count
            FROM events GROUP BY event_type
        """,
        "high_value_events": """
            SELECT event_id, event_type, value FROM events WHERE value > 200
        """,
        "member_filter": """
            SELECT event_type, count(*) AS record_count
            FROM events WHERE event_type IN ('click', 'purchase')
            GROUP BY event_type
        """,
        "distinct_user_event": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "notnull_count": """
            SELECT count(*) AS clean_rows FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        """,
    }
