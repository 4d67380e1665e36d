"""Explicit schemas — the engine never relies on inference in the
primary path (reference declares its schema once,
``spark_processing/spark_processor.py:32-52``; inference exists only as
a serving-side fallback, ``streamlit_ui/dashboard.py:51``).

Two schema families:

1. ``AIR_QUALITY_SCHEMA`` — the reference's 17-field ingest record
   (producer flatten ``data_ingestion/producer.py:73-89`` + consumer
   enrichment ``data_ingestion/consumer.py:98-100``).  The engine
   upgrades ``timestamp``/``processed_timestamp`` from string to
   TimestampType *at rest* (SURVEY.md §1.4) but keeps a string-typed
   RAW variant for ingest parity.
2. Driver testdata schemas (``FIXTURES.md §3``) for the TPC-H-ish +
   events/documents/embeddings tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference ingest record (spark_processor.py:34-52), string timestamps ---
AIR_QUALITY_RAW_SCHEMA = T.StructType(
    [
        T.StructField("location", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("localtime", T.StringType(), True),
        T.StructField("temp_c", T.FloatType(), True),
        T.StructField("humidity", T.IntegerType(), True),
        T.StructField("condition", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("co", T.FloatType(), True),
        T.StructField("no2", T.FloatType(), True),
        T.StructField("o3", T.FloatType(), True),
        T.StructField("so2", T.FloatType(), True),
        T.StructField("pm2_5", T.FloatType(), True),
        T.StructField("pm10", T.FloatType(), True),
        T.StructField("processed_timestamp", T.StringType(), True),
        T.StructField("kafka_offset", T.LongType(), True),
        T.StructField("kafka_partition", T.IntegerType(), True),
    ]
)

#: engine-native variant: event time as TimestampType at rest,
#: doubles instead of floats (float-vs-double drift is the #1 oracle
#: hazard — SURVEY.md §7 risk register).
AIR_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("location", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("localtime", T.StringType(), True),
        T.StructField("temp_c", T.DoubleType(), True),
        T.StructField("humidity", T.IntegerType(), True),
        T.StructField("condition", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("co", T.DoubleType(), True),
        T.StructField("no2", T.DoubleType(), True),
        T.StructField("o3", T.DoubleType(), True),
        T.StructField("so2", T.DoubleType(), True),
        T.StructField("pm2_5", T.DoubleType(), True),
        T.StructField("pm10", T.DoubleType(), True),
        T.StructField("processed_timestamp", T.TimestampType(), True),
        T.StructField("kafka_offset", T.LongType(), True),
        T.StructField("kafka_partition", T.IntegerType(), True),
    ]
)

#: the six pollutant fields defaulted to 0 at the source
#: (producer.py:83-88) — used by cleaning.fill_pollutant_defaults.
POLLUTANT_COLUMNS = ("co", "no2", "o3", "so2", "pm2_5", "pm10")

# --- nested WeatherAPI document shape, pre-flatten (producer.py:66-71) ---
WEATHER_API_SCHEMA = T.StructType(
    [
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("name", T.StringType(), True),
                    T.StructField("region", T.StringType(), True),
                    T.StructField("country", T.StringType(), True),
                    T.StructField("localtime", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "current",
            T.StructType(
                [
                    T.StructField("temp_c", T.DoubleType(), True),
                    T.StructField("humidity", T.IntegerType(), True),
                    T.StructField(
                        "condition",
                        T.StructType([T.StructField("text", T.StringType(), True)]),
                        True,
                    ),
                    T.StructField(
                        "air_quality",
                        T.StructType(
                            [
                                T.StructField("co", T.DoubleType(), True),
                                T.StructField("no2", T.DoubleType(), True),
                                T.StructField("o3", T.DoubleType(), True),
                                T.StructField("so2", T.DoubleType(), True),
                                T.StructField("pm2_5", T.DoubleType(), True),
                                T.StructField("pm10", T.DoubleType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
        T.StructField("error", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# --- driver testdata (FIXTURES.md §3); events.ts is TIMESTAMP(NANOS)
#     in parquet and needs the nanosAsLong read path (sources.readers).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: props payload shape for from_json (F9 / P6)
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])
