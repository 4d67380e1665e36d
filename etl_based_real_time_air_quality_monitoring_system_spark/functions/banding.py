"""CASE-WHEN banding (SURVEY.md §2.8 F1/F2).

The reference hard-codes two band chains:

- F1 AQI band over pm2_5 with *inclusive* upper bounds
  (``spark_processor.py:91-95``: ``<= 12 -> Good``, ``<= 35 ->
  Moderate``, ``<= 55 -> Unhealthy for Sensitive Groups``, ``<= 150 ->
  Unhealthy``, ``<= 250 -> Very Unhealthy``, else ``Hazardous``).
- F2 temperature category with *exclusive* upper bounds
  (``spark_processor.py:99-102``: ``< 0 Freezing``, ``< 10 Cold``,
  ``< 20 Cool``, ``< 30 Warm``, else ``Hot``).

The engine generalizes both into one schema-generic ``band`` builder
(threshold list + labels + inclusivity) so the same operator runs on
the air-quality schema and any driver table.  Pure Column expression —
codegen'd CASE WHEN, no UDF, constant-folded by Catalyst.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F

#: (upper_bound, label) pairs, final label is the open-ended else.
AQI_BANDS: tuple[tuple[float, str], ...] = (
    (12, "Good"),
    (35, "Moderate"),
    (55, "Unhealthy for Sensitive Groups"),
    (150, "Unhealthy"),
    (250, "Very Unhealthy"),
)
AQI_ELSE = "Hazardous"

TEMP_BANDS: tuple[tuple[float, str], ...] = (
    (0, "Freezing"),
    (10, "Cold"),
    (20, "Cool"),
    (30, "Warm"),
)
TEMP_ELSE = "Hot"


def band(
    col: Column | str,
    bounds: Sequence[tuple[float, str]],
    otherwise: str,
    inclusive: bool = True,
) -> Column:
    """Generic threshold banding: CASE WHEN col (<=|<) b0 THEN l0 ... ELSE e.

    ``inclusive=True`` reproduces F1's ``<=`` chain, ``False`` F2's
    ``<``.  Null input propagates to the ELSE branch in neither engine:
    ``null <= x`` is null, so every WHEN misses and the ELSE fires —
    identical in Spark and ANSI SQL, which keeps the oracle honest.
    """
    c = F.col(col) if isinstance(col, str) else col
    first_bound, first_label = bounds[0]
    cond = c <= F.lit(first_bound) if inclusive else c < F.lit(first_bound)
    expr = F.when(cond, first_label)
    for bound_value, label in bounds[1:]:
        cond = c <= F.lit(bound_value) if inclusive else c < F.lit(bound_value)
        expr = expr.when(cond, label)
    return expr.otherwise(otherwise)


def aqi_band(col: Column | str = "pm2_5") -> Column:
    """F1 — EPA-style AQI band (spark_processor.py:91-95)."""
    return band(col, AQI_BANDS, AQI_ELSE, inclusive=True)


def temp_category(col: Column | str = "temp_c") -> Column:
    """F2 — temperature category (spark_processor.py:99-102)."""
    return band(col, TEMP_BANDS, TEMP_ELSE, inclusive=False)


def band_case_sql(
    col: str,
    bounds: Sequence[tuple[float, str]],
    otherwise: str,
    inclusive: bool = True,
) -> str:
    """The equivalent ANSI CASE text (for oracle SQL generation)."""
    op = "<=" if inclusive else "<"
    whens = " ".join(
        f"WHEN {col} {op} {bound_value} THEN '{label}'" for bound_value, label in bounds
    )
    return f"CASE {whens} ELSE '{otherwise}' END"
