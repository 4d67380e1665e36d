"""Window-function operators (SURVEY.md §2.5).

The reference's only latent window semantic is latest-per-key
(topk.latest_per_key).  The engine rounds this out with the standard
analytic shapes — running totals, ranks, lag deltas — all one shuffle
on the partition key, no global sort.

Scale note: an ``orderBy`` window WITHOUT ``partitionBy`` forces every
row through a single task — never do that on a fact table; always
partition the window by a key with enough cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _ts_micros(ts: str | Column) -> Column:
    """Microseconds-since-epoch for TIMESTAMP *or* TIMESTAMP_NTZ input.

    ``unix_micros`` rejects NTZ at analysis time; casting first makes
    the time-based operators type-agnostic.  NTZ→TIMESTAMP interprets
    the wall clock in the session timezone (the engine pins UTC), so
    gap/range arithmetic — which only ever subtracts two of these —
    is identical either way.
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(col.cast("timestamp"))


def running_total(
    df: DataFrame,
    key: str | Sequence[str],
    order: str | Sequence[str],
    value: str,
    alias: str = "running_total",
) -> DataFrame:
    """Cumulative sum per key in event order (rows unbounded-preceding
    to current)."""
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*orders)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))


def ranked(
    df: DataFrame,
    key: str | Sequence[str],
    order_desc: str,
    method: str = "rank",
    alias: str = "rank",
) -> DataFrame:
    """rank / dense_rank / row_number per key, descending order."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(order_desc).desc())
    fn = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}[method]
    return df.withColumn(alias, fn().over(w))


def top_n_per_key(
    df: DataFrame,
    key: str | Sequence[str],
    order_desc: str,
    n: int,
    tie_break: str | None = None,
) -> DataFrame:
    """Top-N rows per key — row_number <= n.  The per-key analog of
    TakeOrderedAndProject; each task only keeps n rows per key after
    the key shuffle."""
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(order_desc).desc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def sessionize(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    gap_seconds: int,
    order_tie_break: str | None = None,
    alias: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event for the same key exceeds ``gap_seconds``.

    Classic two-window composition — boundary flag via ``lag`` then a
    running sum numbers the sessions — both windows share the same
    (key)-partitioning and ordering, so Catalyst plans ONE shuffle and
    one sort for the whole thing (the batch analog of Structured
    Streaming's ``session_window``).
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts)] + ([F.col(order_tie_break)] if order_tie_break else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    t_us = _ts_micros(ts)
    prev_us = F.lag(t_us, 1).over(w)
    boundary = F.when(
        prev_us.isNull() | (t_us - prev_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("_boundary", boundary)
        .withColumn(alias, F.sum("_boundary").over(running))
        .drop("_boundary")
    )


def moving_frame_sum(
    df: DataFrame,
    key: str | Sequence[str],
    order: str | Sequence[str],
    value,
    preceding: int,
    alias: str = "moving_sum",
    count_alias: str | None = "frame_count",
) -> DataFrame:
    """ROWS-frame sliding aggregate: sum of ``value`` over the last
    ``preceding`` rows plus the current one, per key in event order.

    ``value`` may be a Column (e.g. a decimal cast when the result must
    be bit-identical across engines — float sums are order-sensitive).
    One shuffle on the key, one sort; the frame itself is evaluated
    streamingly inside each partition (no quadratic work).
    """
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)
    val = F.col(value) if isinstance(value, str) else value
    w = (
        Window.partitionBy(*keys)
        .orderBy(*orders)
        .rowsBetween(-preceding, Window.currentRow)
    )
    out = df.withColumn(alias, F.sum(val).over(w))
    if count_alias:
        out = out.withColumn(count_alias, F.count(F.lit(1)).over(w))
    return out


def trailing_range_count(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    seconds: int,
    alias: str = "trailing_count",
) -> DataFrame:
    """RANGE-frame trailing count: events per key within the closed
    interval ``[ts - seconds, ts]`` of each row's event time.

    The frame is a RANGE over ``unix_micros(ts)`` so rows with equal
    timestamps are peers (included together), matching ANSI
    ``RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW``.  Single
    shuffle on the key; the range frame slides with two pointers, so
    cost is linear per partition.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        Window.partitionBy(*keys)
        .orderBy(_ts_micros(ts))
        .rangeBetween(-seconds * 1_000_000, 0)
    )
    return df.withColumn(alias, F.count(F.lit(1)).over(w))


def lag_delta(
    df: DataFrame,
    key: str | Sequence[str],
    order: str,
    value: str,
    alias: str = "delta",
) -> DataFrame:
    """value - lag(value) per key in order — the change-since-previous
    semantic (e.g. pollutant delta between consecutive readings)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(order)
    return df.withColumn(alias, F.col(value) - F.lag(value, 1).over(w))


def running_distinct_count(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    item_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Cumulative distinct-count per key stream ("how many distinct
    event types has this user produced so far") WITHOUT carrying a
    set: mark each row as first-seen via a row_number over
    (key, item) [shuffle 1], then running-sum the 0/1 flags over the
    (key)-ordered stream [shuffle 2].  Both windows are key-
    partitioned — no global sort, state per row is one bit, and the
    result is exact under the (ts, tiebreak) total order.
    """
    w_first = Window.partitionBy(key_col, item_col).orderBy(
        _ts_micros(ts_col), F.col(tiebreak_col)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(_ts_micros(ts_col), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn(
        "_first", (F.row_number().over(w_first) == 1).cast("long")
    )
    return flagged.withColumn(
        "distinct_so_far", F.sum("_first").over(w_run)
    ).drop("_first")
