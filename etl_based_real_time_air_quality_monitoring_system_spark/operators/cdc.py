"""Change-data-capture operators: upsert merge + SCD2 history.

The reference's pipeline is append-only (consumer.py writes one file
per record and never revises), but any warehouse built on it needs the
two standard mutation patterns:

- ``merge_upsert`` — apply a batch of keyed updates (with optional
  tombstones) onto a base snapshot: MERGE WHEN MATCHED THEN UPDATE /
  WHEN NOT MATCHED THEN INSERT, expressed relationally.
- ``scd2_history`` — slowly-changing-dimension type-2: turn a keyed
  event/version stream into validity intervals ``[valid_from,
  valid_to)`` with a current-row flag.

Both are pure DataFrame compositions (no table format required): at
100 TB ``merge_upsert`` is one anti-join shuffle on the key (broadcast
when the update batch is dimension-sized — the common CDC case), and
``scd2_history`` is one key-partitioned window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str | Sequence[str],
    delete_col: str | None = None,
    broadcast_updates: bool = False,
) -> DataFrame:
    """Upsert ``updates`` into ``base`` by ``key``: an update row
    replaces the base row with its key, a new key is inserted, and —
    when ``delete_col`` names a boolean column — a tombstone update
    deletes the key instead.

    Relational MERGE: survivors-of-base (LEFT ANTI join against update
    keys) UNION non-tombstone updates.  One shuffle on the key; pass
    ``broadcast_updates=True`` when the batch is small relative to the
    snapshot (the typical incremental-CDC shape) and the anti join
    becomes broadcast — the snapshot never shuffles at all.

    ``updates`` must be unique per key (pre-compact with
    ``topk.latest_per_key`` — see ``scd2_history`` for ordering).
    """
    keys = [key] if isinstance(key, str) else list(key)
    upd_keys = updates.select(*keys)
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    kept = base.join(upd_keys, keys, "left_anti")
    live = updates
    if delete_col is not None:
        live = updates.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
        live = live.drop(delete_col)
    return kept.unionByName(live)


def scd2_history(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    tie_break: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """SCD type-2 history from a keyed version stream: each row becomes
    a validity interval ``[ts, next ts)``; the last version per key is
    open-ended (``valid_to`` NULL) and flagged current.

    One window per key ordered by event time (plus ``tie_break`` for
    determinism when versions share a timestamp) — a single shuffle on
    the key, the same partitioning any downstream point-in-time join
    would reuse.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts)] + ([F.col(tie_break)] if tie_break else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(valid_from, F.col(ts))
        .withColumn(valid_to, F.lead(ts, 1).over(w))
        .withColumn(current_flag, F.col(valid_to).isNull())
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key: str | Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the dimension version that was valid at
    the fact's timestamp: ``key`` equality plus ``valid_from <=
    fact_ts < valid_to`` (open-ended current rows match everything
    after ``valid_from``).

    Because the interval predicate rides ON TOP of a key equality,
    this plans as an ordinary hash join on the key with a residual
    range filter — one shuffle each side (or broadcast for a
    dimension-sized history), never a nested-loop over intervals.
    The standard feature-store / training-data discipline against
    label leakage: a fact may only see dimension state from its past.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cond = None
    for k in keys:
        c = facts[k] == history[k]
        cond = c if cond is None else cond & c
    in_range = (facts[fact_ts] >= history[valid_from]) & (
        history[valid_to].isNull() | (facts[fact_ts] < history[valid_to])
    )
    joined = facts.join(history, cond & in_range, how)
    # the history's key copies are redundant after the equi-match
    for k in keys:
        joined = joined.drop(history[k])
    return joined
