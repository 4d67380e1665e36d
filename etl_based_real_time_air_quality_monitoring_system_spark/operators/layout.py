"""Multi-dimensional data layout: Z-order (Morton) clustering.

Partitioning prunes on ONE dimension and bucketing co-locates ONE key;
when queries filter on several columns at once (time AND user AND
value band), a Z-order sort makes parquet row-group min/max stats
tight on ALL of them simultaneously — each row group covers a small
hyper-rectangle of the key space instead of a thin slab, so every
per-column predicate skips most groups.  This is the standard lakehouse
layout trick (Delta/Iceberg ``OPTIMIZE ZORDER BY``), built here from
first principles on open Spark.

Scale shape: rank-scaling needs one tiny global min/max aggregate per
column (driver-bounded, one row); the z-value itself is pure integer
bit arithmetic (JVM expressions, no UDF); the write is one global sort
by z — the same range-exchange any sorted write pays.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def interleave_bits(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton/Z-value: interleave the low ``bits`` bits of each
    (non-negative integer) column — bit ``j`` of column ``i`` lands at
    position ``j*n + i``.  Pure integer expressions; ``bits *
    len(cols)`` must fit a signed long (≤ 63)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"interleave_bits: {n} cols x {bits} bits = {n * bits} bits "
            "won't fit a signed 64-bit z-value; lower `bits`"
        )
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            z = z + (bit * F.lit(1 << (j * n + i)))
    return z


def rank_scale(
    df: DataFrame,
    col: str,
    bits: int = 16,
    bounds: tuple[float | None, float | None] | None = None,
) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits) by
    linear min/max scaling — the normalization step before bit
    interleaving.  One tiny global (min, max) aggregate (driver
    collects a single row); the per-row transform
    ``floor((x - min) * k)`` with ``k = (2^bits - 1) / (max - min)``
    is deterministic IEEE-754 double arithmetic, so any engine lands
    on the identical cell.  A constant column maps to cell 0; NULLs
    map to cell 0 (they sort first, same as a NULLS FIRST layout).

    Pass ``bounds=(lo, hi)`` when the caller already holds the global
    min/max (e.g. from a shared statistics pass) to skip the aggregate
    job — at scale that saves one full-column scan per dimension."""
    if bounds is not None:
        lo, hi = bounds
    else:
        row = df.agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        ).collect()[0]
        lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None or hi == lo:
        return F.lit(0).cast("long")
    k = ((1 << bits) - 1) / (hi - lo)
    return F.coalesce(
        F.floor((F.col(col).cast("double") - F.lit(lo)) * F.lit(k)).cast("long"),
        F.lit(0),
    )


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Z-value over ``cols``: rank-scale each onto the 2^bits grid,
    then interleave.  Returns a Column to sort or range-partition by.
    ``bounds`` maps column name -> (min, max) for columns whose global
    statistics the caller already computed (others aggregate here)."""
    bounds = bounds or {}
    return interleave_bits(
        [rank_scale(df, c, bits, bounds.get(c)) for c in cols], bits
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write parquet clustered by the Z-order of ``cols``: one global
    sort on the z-value (range exchange + per-task sort — the cost any
    sorted write pays once), so each output file / row group covers a
    compact hyper-rectangle and multi-column predicates prune on every
    dimension.  ``n_files`` caps the layout's granularity (defaults to
    the session's shuffle parallelism)."""
    from .sampling import reserve_columns

    reserve_columns(df, ("_z",), "write_zordered")
    z = zorder_value(df, cols, bits, bounds)
    out = df.withColumn("_z", z)
    out = (
        out.repartitionByRange(n_files, "_z") if n_files else out.repartitionByRange("_z")
    )
    out.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)
