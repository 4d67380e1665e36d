"""Weighted linear scoring (SURVEY.md §2.8 F6/F7).

Reference: ``pollution_score = round(pm2_5*0.3 + pm10*0.25 + no2*0.2 +
o3*0.15 + co*0.05 + so2*0.05, 2)`` (``spark_processor.py:121-132``).

Generalized to any (column, weight) mapping; pure column arithmetic so
it stays inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, functions as F

POLLUTION_WEIGHTS: dict[str, float] = {
    "pm2_5": 0.3,
    "pm10": 0.25,
    "no2": 0.2,
    "o3": 0.15,
    "co": 0.05,
    "so2": 0.05,
}


def weighted_score(weights: Mapping[str, float], scale: int | None = 2) -> Column:
    """F6+F7 — sum(col*w), optionally rounded to ``scale`` decimals.

    Term order follows the mapping's iteration order so the float sum
    is reproducible (relevant when matching an oracle bit-for-bit).
    """
    items = iter(weights.items())
    name, weight = next(items)
    expr = F.col(name) * F.lit(weight)
    for name, weight in items:
        expr = expr + F.col(name) * F.lit(weight)
    return F.round(expr, scale) if scale is not None else expr


def pollution_score() -> Column:
    """The reference's exact pollution score (spark_processor.py:121-132)."""
    return weighted_score(POLLUTION_WEIGHTS, scale=2)
