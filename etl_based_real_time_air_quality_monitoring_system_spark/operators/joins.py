"""Join operators (SURVEY.md §2.3).

The reference performs zero joins — a single wide fact table — so
these are the engine's own surface, designed for the driver's TPC-H-ish
star schema and for 100 TB:

- **Dimension joins broadcast.**  ``region``/``nation``/``customer``
  are small; ``F.broadcast`` pins the hash side so the 100 TB fact
  table never shuffles for the join.  (AQE would usually pick this,
  but an explicit hint is free insurance and documents intent.)
- **Fact-fact joins sort-merge on the key** with AQE skew-join
  splitting oversized partitions at runtime.
- **Semi/anti joins** express EXISTS / NOT EXISTS without
  materializing the right side's columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dimension side broadcast — zero shuffle on
    the fact side."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """EXISTS — keeps left rows with a match; right columns never
    materialize."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS — left rows with no match."""
    return left.join(right, on, "left_anti")


def star_join(fact: DataFrame, dims: Sequence[tuple[DataFrame, str | Column]]) -> DataFrame:
    """Chain of broadcast dimension joins off one fact table; Catalyst
    collapses them into successive BroadcastHashJoins with the fact
    scanned once."""
    out = fact
    for dim, key in dims:
        out = out.join(F.broadcast(dim), key, "inner")
    return out
