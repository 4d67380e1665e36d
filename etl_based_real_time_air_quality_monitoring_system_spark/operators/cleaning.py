"""Cleaning operators (SURVEY.md §2.2 P1/P2/P7).

Reference pipeline head: ``dropDuplicates()`` then three not-null
filters (``spark_processor.py:83-86``); pollutant null->0 defaulting at
the source (``producer.py:83-88``).

Scale notes: full-row ``dropDuplicates()`` is a shuffle on *every*
column — at 100 TB prefer ``exact_dedup(df, keys)`` on a business key,
which shuffles only the key hash and lets AQE coalesce.  The not-null
filters sit directly above the scan so Catalyst pushes them into the
parquet reader (``PushedFilters: IsNotNull(...)``) — rows never leave
the scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F


def exact_dedup(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """P1 — ``dropDuplicates`` (spark_processor.py:83); subset form for
    the scale path."""
    return df.dropDuplicates(list(keys)) if keys else df.dropDuplicates()


def drop_null_rows(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P2 — conjunction of not-null predicates
    (spark_processor.py:84-86); one ``filter`` call so the plan shows a
    single pushed predicate set."""
    cond = F.col(columns[0]).isNotNull()
    for c in columns[1:]:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond)


def fill_defaults(df: DataFrame, defaults: Mapping[str, float]) -> DataFrame:
    """P7 — null->default imputation (producer.py:83-88's
    ``.get(k, 0)``), as ``na.fill`` (codegen'd coalesce)."""
    return df.na.fill(dict(defaults))
