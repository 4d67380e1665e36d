"""S1 — the HTTP API source (SURVEY.md §2.1).

The reference polls WeatherAPI ``current.json`` with ``aqi=yes``, a
10 s timeout, and an error-envelope check
(``data_ingestion/producer.py:35-61``).  Spark has no built-in HTTP
source, so the idiomatic shape is: a thin driver-side fetcher feeding
payload strings into a DataFrame (batch) or a file/Kafka landing zone
(streaming), with ALL parsing/flattening done engine-side
(``functions.jsonio.flatten_weather_doc`` — from_json + nested
projection, producer.py:73-89's flatten without Python loops).

``requests`` may be absent in a minimal container: the fetcher is
import-gated, and ``simulate_weather_docs`` provides a deterministic
stand-in exercising the same envelope/missing-field edge cases.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..functions.jsonio import flatten_weather_doc

DEFAULT_TIMEOUT_S = 10  # producer.py:44


def fetch_weather_docs(
    api_key: str,
    cities: Sequence[str],
    base_url: str = "http://api.weatherapi.com/v1/current.json",
    timeout: int = DEFAULT_TIMEOUT_S,
) -> list[str]:
    """Driver-side fetch mirroring producer.py:35-61: one GET per city
    with ``aqi=yes``; network failures return no payload for that city
    (log-and-continue, producer.py:56-61)."""
    try:
        import requests
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "requests not available in this environment; use "
            "simulate_weather_docs for tests"
        ) from exc
    payloads: list[str] = []
    for city in cities:
        try:
            resp = requests.get(
                base_url,
                params={"key": api_key, "q": city, "aqi": "yes"},
                timeout=timeout,
            )
            payloads.append(resp.text)
        except Exception:  # noqa: BLE001 - per-city isolation
            continue
    return payloads


def simulate_weather_docs(n: int, error_every: int = 7, missing_aqi_every: int = 5) -> list[str]:
    """Deterministic fake WeatherAPI payloads: every ``error_every``-th
    doc is an error envelope (P5 must drop it), every
    ``missing_aqi_every``-th lacks ``air_quality`` (P7 must default the
    pollutants to 0)."""
    docs = []
    for i in range(n):
        if i % error_every == 0:
            docs.append(json.dumps({"error": {"code": "1006", "message": "no match"}}))
            continue
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)
        doc = {
            "location": {
                "name": f"City{i % 5}",
                "region": "R",
                "country": "C",
                "localtime": f"2024-01-{i % 28 + 1:02d} {i % 24:02d}:00",
            },
            "current": {
                "temp_c": (h % 650) / 10.0 - 20.0,
                "humidity": h % 101,
                "condition": {"text": "Clear"},
            },
        }
        if i % missing_aqi_every != 0:
            doc["current"]["air_quality"] = {
                "co": (h % 400) / 1.7,
                "no2": (h % 300) / 2.3,
                "o3": (h % 200) / 1.9,
                "so2": (h % 100) / 3.1,
                "pm2_5": (h % 4000) / 10.0,
                "pm10": (h % 500) / 1.3,
            }
        docs.append(json.dumps(doc))
    return docs


def ingest_payloads(spark: SparkSession, payloads: Sequence[str]) -> DataFrame:
    """payload strings -> flattened air-quality records, engine-side:
    error envelopes dropped (P5), nested fields projected (P6),
    missing pollutants defaulted to 0 (P7)."""
    raw = spark.createDataFrame([(p,) for p in payloads], ["payload"])
    return flatten_weather_doc(raw, "payload")
