"""Reshaping operators: set ops, pivot/unpivot, rollup/cube
(SURVEY.md §2.7 — none in the reference; engine-native surface).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION (set semantics) — union by name then distinct; the
    distinct is a key-hash shuffle, so prefer unionAll when duplicates
    are acceptable at scale."""
    return a.unionByName(b).distinct()


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT (set semantics)."""
    return a.subtract(b)


def except_all_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT ALL (multiset semantics: multiplicities subtract).
    Spark plans a count-tagged aggregate + generate, not a join —
    one shuffle per side on the full row."""
    return a.exceptAll(b)


def intersect_all_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """INTERSECT ALL (multiset semantics: min of multiplicities)."""
    return a.intersectAll(b)


def pivot_agg(
    df: DataFrame,
    key: str,
    pivot_col: str,
    pivot_values: Sequence[str],
    value: str,
    agg: str = "sum",
) -> DataFrame:
    """Pivot with EXPLICIT pivot values — omitting them costs an extra
    distinct-scan job to discover categories, which at 100 TB is a full
    pass over the fact table.  Output columns renamed to
    ``{agg}_{value}_{pivotval}`` for oracle alignment."""
    agg_fn = {"sum": F.sum, "avg": F.avg, "count": F.count, "max": F.max, "min": F.min}[agg]
    out = df.groupBy(key).pivot(pivot_col, list(pivot_values)).agg(agg_fn(value))
    renames = {v: f"{agg}_{value}_{v}" for v in pivot_values}
    return out.select(key, *[F.col(f"`{v}`").alias(n) for v, n in renames.items()])


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long via the built-in unpivot (melt)."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)


def rollup_agg(
    df: DataFrame, keys: Sequence[str], value: str, scale: int = 2
) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical subtotals + grand total in one
    pass (Spark expands grouping sets inside a single shuffle)."""
    level = sum(F.grouping(k).cast("int") for k in keys)
    return df.rollup(*keys).agg(
        F.count("*").alias("record_count"),
        F.round(F.sum(value), scale).alias(f"sum_{value}"),
        level.alias("grouping_level"),
    )


def cube_agg(df: DataFrame, keys: Sequence[str], value: str, scale: int = 2) -> DataFrame:
    """GROUP BY CUBE — all key combinations."""
    level = sum(F.grouping(k).cast("int") for k in keys)
    return df.cube(*keys).agg(
        F.count("*").alias("record_count"),
        F.round(F.sum(value), scale).alias(f"sum_{value}"),
        level.alias("grouping_level"),
    )


def grouping_sets_agg(
    df: DataFrame,
    keys: Sequence[str],
    sets: Sequence[Sequence[str]],
    value,
    sum_alias: str = "value_sum",
) -> DataFrame:
    """GROUP BY GROUPING SETS — an explicit, possibly sparse subset of
    the cube lattice, expanded inside ONE shuffle (Spark plans a single
    Expand + HashAggregate, not one scan per set).

    Per-key ``grouping(k)`` indicator columns (0 = grouped, 1 =
    aggregated away) disambiguate subtotal rows from genuine NULL key
    values.  ``value`` may be a pre-cast Column (decimal for
    cross-engine exactness).
    """
    val = F.col(value) if isinstance(value, str) else value
    flags = [F.grouping(k).cast("int").alias(f"grp_{k}") for k in keys]
    return df.groupingSets([list(s) for s in sets], *keys).agg(
        F.count("*").alias("record_count"),
        F.sum(val).alias(sum_alias),
        *flags,
    )
