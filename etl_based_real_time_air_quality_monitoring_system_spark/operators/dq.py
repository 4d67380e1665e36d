"""Automated data-quality checks — the feature the reference's README
lists as FUTURE work (`README.md:46-53` "Automated Data Quality
Checks") and never builds; here it is a first-class one-pass operator.

Design: every check is a boolean *violation* predicate evaluated
row-wise inside ONE aggregation (conditional sums), so a full DQ sweep
over a 100 TB table costs exactly one scan + one tiny all-to-one
aggregate — no per-check jobs, no second pass.  Uniqueness checks ride
in the same pass as ``count(*) - count(distinct key)``.

The wide one-row result is unpivoted to (check_name, violations,
total_rows) so downstream alerting can threshold per check.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def not_null_check(col: str) -> Column:
    """Violation: value is NULL."""
    return F.col(col).isNull()


def in_range_check(col: str, lo: float, hi: float) -> Column:
    """Violation: value outside [lo, hi] (NULL does not violate —
    pair with not_null_check to enforce presence)."""
    c = F.col(col)
    return c.isNotNull() & ~c.between(lo, hi)


def in_set_check(col: str, allowed: Sequence[str]) -> Column:
    """Violation: value not in the allowed set (NULLs excluded)."""
    c = F.col(col)
    return c.isNotNull() & ~c.isin(*allowed)


def dq_report(
    df: DataFrame,
    checks: Mapping[str, Column],
    unique_keys: Sequence[str] = (),
) -> DataFrame:
    """One-pass data-quality report.

    ``checks``: name -> boolean Column where true means VIOLATION.
    ``unique_keys``: columns that must be unique; each adds a
    ``<col>_dup`` row counting surplus duplicates.

    Output: one row per check — (check_name, violations, total_rows).
    """
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in checks.items()
    ]
    aggs += [
        (F.count("*") - F.countDistinct(k)).cast("long").alias(f"{k}_dup")
        for k in unique_keys
    ]
    aggs.append(F.count("*").alias("_total"))
    wide = df.agg(*aggs)
    value_cols = [c for c in wide.columns if c != "_total"]
    return wide.unpivot(
        ids=["_total"],
        values=value_cols,
        variableColumnName="check_name",
        valueColumnName="violations",
    ).select("check_name", "violations", F.col("_total").alias("total_rows"))


def table_profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Deequ-style per-column profile — the first thing a lake
    pipeline computes about an unfamiliar table: row count, null
    count, and exact distinct count per column.

    One aggregation pass over the scan; the multiple exact
    count-distincts compile to Spark's Expand-based plan (one input
    row fans out per distinct aggregate), which is the exact-answer
    cost — at 100 TB swap in approx_count_distinct (see the
    ``sketch_profile`` pattern) and the Expand disappears.  The wide
    one-row result is unpivoted driver-side-free via ``unpivot``.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    wide = df.agg(*aggs)
    nulls = wide.unpivot(
        ids=["_total"],
        values=[f"{c}__nulls" for c in cols],
        variableColumnName="column_name",
        valueColumnName="n_nulls",
    ).select(
        F.regexp_replace("column_name", "__nulls$", "").alias("column_name"),
        F.col("_total").alias("n_rows"),
        "n_nulls",
    )
    distincts = wide.unpivot(
        ids=[],
        values=[f"{c}__distinct" for c in cols],
        variableColumnName="column_name",
        valueColumnName="n_distinct",
    ).select(
        F.regexp_replace("column_name", "__distinct$", "").alias("column_name"),
        "n_distinct",
    )
    return nulls.join(distincts, "column_name")
