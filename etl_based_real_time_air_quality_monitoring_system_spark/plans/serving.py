"""Entry point 3 — the serving path (SURVEY.md §3), done right.

The reference dashboard collects the ENTIRE table to pandas on every
cache miss (``streamlit_ui/dashboard.py:59``) and re-aggregates in
pandas.  Here every dashboard widget is a Spark query that aggregates
or limits FIRST; ``toPandas`` only ever sees tile-sized results.  At
100 TB the difference is "works" vs "driver OOM".

Widget -> operator mapping:
- stat tiles (dashboard.py:173-202,330-334)  -> ONE multi-aggregate
  pass (A6 count, A7 distinct, A8 means, A9 range)
- pollutant means loop (dashboard.py:129-132) -> one agg (A8)
- AQI pie (dashboard.py:281)                  -> freq_distribution (A10)
- "current" reading (dashboard.py:266)        -> latest_per_key (A11)
- explorer top-k (dashboard.py:343-357)       -> isin filter + top_k
  (P8 + O5, TakeOrderedAndProject)
- metric picker (dashboard.py:290)            -> schema introspection (P9)
- CSV download (dashboard.py:361-367)         -> limit-then-collect (S12)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType

from ..operators.aggregates import freq_distribution, global_means
from ..operators.topk import latest_per_key, top_k
from ..sources.writers import export_csv_pandas


def dashboard_tiles(
    df: DataFrame,
    key: str = "location",
    metrics: Sequence[str] = ("temp_c", "pm2_5", "humidity"),
    scale: int = 2,
) -> DataFrame:
    """All stat tiles in ONE aggregation pass (the reference computes
    each tile as a separate pandas scan)."""
    aggs = [
        F.count("*").alias("record_count"),
        F.countDistinct(key).alias(f"distinct_{key}"),
    ]
    for m in metrics:
        aggs.append(F.round(F.avg(m), scale).alias(f"avg_{m}"))
    last = metrics[-1]
    aggs.append((F.max(last) - F.min(last)).alias(f"range_{last}"))
    return df.agg(*aggs)


def aqi_distribution(df: DataFrame, band_col: str = "air_quality_index") -> DataFrame:
    """A10 — the pie chart's value_counts."""
    return freq_distribution(df, band_col)


def pollutant_means(df: DataFrame, pollutants: Sequence[str]) -> DataFrame:
    """A8 — per-pollutant means, one pass instead of a pandas loop."""
    return global_means(df, list(pollutants))


def current_readings(
    df: DataFrame, key: str = "location", ts: str = "timestamp", tie_break: str | None = None
) -> DataFrame:
    """A11 — the 'current' value per key = latest row per key."""
    return latest_per_key(df, key, ts, tie_break=tie_break)


def numeric_columns(df: DataFrame) -> list[str]:
    """P9 — metric-picker candidates from the schema (no scan)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]


def explore_top_k(
    df: DataFrame,
    member_col: str,
    members: Sequence[str],
    sort_col: str,
    k: int = 50,
    tie_break: str | None = None,
) -> DataFrame:
    """P8 + O5 — membership filter then bounded top-k (the explorer
    table with its <=1000-row cap, dashboard.py:343-357)."""
    filtered = df.filter(F.col(member_col).isin(*members)) if members else df
    return top_k(filtered, [sort_col], k, tie_break=tie_break)


def download_csv(df: DataFrame, limit: int = 1000) -> str:
    """S12 — bounded CSV export; the limit runs engine-side."""
    return export_csv_pandas(df, limit)
