"""Sinks (SURVEY.md §2.1).

- S10 partitioned parquet sink (``spark_processor.py:202-205``)
- S11 single-file CSV summary sink (``spark_processor.py:219-224``)
- S12 bounded CSV export at the serving edge (``dashboard.py:361-367``)

Scale notes: the partitioned parquet write is the fact-table path —
dynamic partition dirs, never coalesced.  ``coalesce(1)`` is reserved
for the *summary* table (a few hundred rows) exactly as the reference
does; putting it on a fact table serializes the job onto one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("location", "year", "month"),
    mode: str = "overwrite",
) -> None:
    """S10 — reference partitioning scheme ``location, year, month``
    (spark_processor.py:204) so later per-location / per-date predicates
    prune whole directories at 100 TB."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_single_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11 — grouped summary to one CSV file with header
    (spark_processor.py:219-224).  Summary tables only."""
    df.coalesce(1).write.mode(mode).option("header", "true").csv(path)


def export_csv_pandas(df: DataFrame, limit: int = 1000) -> str:
    """S12 — serving-edge CSV export: cap rows *before* collecting
    (fixes dashboard.py:59's full-table ``toPandas``)."""
    return df.limit(limit).toPandas().to_csv(index=False)
