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

from pyspark.sql import Column, DataFrame, Window, functions as F



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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the left (big, skewed) side gets a
    deterministic salt from ``xxhash64(salt_from) % n_salts``; the
    right side is replicated once per salt value, so a hot key's rows
    spread over ``n_salts`` shuffle partitions instead of one straggler
    task.

    AQE's skew-join splitting (enabled in session.py) handles most
    skew at runtime; explicit salting is for the cases AQE can't fix —
    a single key too hot for any split, a join whose output
    partitioning a downstream same-key aggregate reuses (AQE refuses
    to split there: it would break the required distribution — both
    behaviors pinned on executed adaptive plans in
    ``test_aqe_skew_join_split_fires_and_its_limit``), or a
    deterministic layout you want stable across runs.  Cost: right side shuffles n_salts copies
    — use only when the right side is modest (but too big / wrong
    shape to broadcast).

    ``salt_from`` should be a high-cardinality left column (a row id)
    so salts distribute evenly.  Result equals the unsalted join
    row-for-row (asserted in tests).
    """
    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_l.join(
        salted_r,
        (salted_l[left_key] == salted_r[right_key])
        & (salted_l["_salt"] == salted_r["_salt"]),
        how,
    )
    return out.drop("_salt")


def range_join(
    fact: DataFrame,
    intervals: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Interval (range) join: fact rows matched to the interval rows
    with ``lo <= value < hi``.  The interval side is broadcast, so the
    non-equi condition evaluates as a BroadcastNestedLoopJoin — linear
    in the fact table, never a cartesian shuffle.  Correct whenever the
    interval set is dimension-sized (band tables, calendars, SLA
    tiers); for two large interval sets you'd bucketize both sides on
    ``floor(value / bucket)`` first to recover an equi-join."""
    cond = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    # r13: no pre-shuffle.  The spread_small_input that used to sit on
    # the fact side was a measured net loss for dimension-sized
    # interval sets (the operator's stated domain): the round-robin
    # exchange of the fact extract costs more than the per-row
    # condition it parallelizes (isolated warm at sf0.1, 5 bands:
    # 0.37 s plain vs 0.48 s spread at 32 cores; plain also scales
    # normally where spread inverted 8->32 cores).  On a real fact
    # table the scan is already wide, so this changes nothing at
    # scale; for a HUGE interval side use range_join_bucketed.
    return fact.join(F.broadcast(intervals), cond, "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single closest right row with
    the same ``key`` — ``direction="backward"`` (default) takes the
    most recent right row with ``right_time <= left_time``;
    ``direction="forward"`` takes the earliest right row with
    ``right_time >= left_time`` (time-to-next-event analyses).  Exact
    time matches count in both directions.

    Spark has no ASOF JOIN operator, and the naive encoding
    (theta-join on ``r.t <= l.t`` + max_by) explodes to O(|L|x|R|)
    per key.  This is the scale-correct composition instead: UNION the
    two sides tagged (right rows sort before left rows at equal time),
    then one pass of ``last(payload, ignorenulls=True)`` over a
    (key)-partitioned, (time, tag)-ordered running window.  One
    shuffle on the key, linear work per partition — the sort-merge
    as-of strategy native engines (and DuckDB's ASOF JOIN, the test
    oracle) implement internally.

    Right-side payload travels as ONE struct column so legitimately
    NULL payload fields don't make ``last(..., ignorenulls)`` skip to
    an older right row.

    Right rows should be unique per (key, time) — dedupe with
    ``topk.latest_per_key`` first; ties would make the winner
    engine-dependent.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    payload = F.struct(*[F.col(c) for c in right_values]).alias("_rp")
    payload_type = right.select(payload).schema["_rp"].dataType

    # tag ordering makes equal-time right rows visible to the window:
    # backward scans the past (right sorts BEFORE left at equal t),
    # forward scans the future (right sorts AFTER left at equal t)
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0 if direction == "backward" else 2).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        payload,
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        *left.columns,
        F.lit(None).cast(payload_type).alias("_rp"),
    )

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last("_rp", ignorenulls=True)
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_tag")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first("_rp", ignorenulls=True)
    matched = (
        r.unionByName(l)
        .withColumn("_m", pick.over(w))
        .filter(F.col("_tag") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    return matched.select(
        *left.columns,
        *[F.col(f"_m.{c}").alias(c) for c in right_values],
    )


def full_outer_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    status_col: str = "diff_status",
) -> DataFrame:
    """CDC-style snapshot diff: FULL OUTER join two snapshots on their
    key and classify every key as added / removed / changed /
    unchanged (null-safe value comparison).

    The one reference-adjacent join type the rest of the library
    doesn't exercise: both sides are fact-sized, so neither broadcasts
    — Catalyst plans a shuffle on the key for each side (SortMergeJoin
    at scale).  Output columns: keys, old_<v>/new_<v> per value, and
    ``status_col``.
    """
    o = old.select(
        *keys,
        F.lit(1).alias("_in_old"),
        *[F.col(v).alias(f"old_{v}") for v in values],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_in_new"),
        *[F.col(v).alias(f"new_{v}") for v in values],
    )
    j = o.join(n, list(keys), "full_outer")
    changed = None
    for v in values:
        neq = ~F.col(f"old_{v}").eqNullSafe(F.col(f"new_{v}"))
        changed = neq if changed is None else (changed | neq)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        *[F.col(f"old_{v}") for v in values],
        *[F.col(f"new_{v}") for v in values],
        status.alias(status_col),
    )


def range_join_bucketed(
    fact: DataFrame,
    intervals: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    *,
    bucket_width: float,
    clamp_lo: float,
    clamp_hi: float,
) -> DataFrame:
    """Equi-join scale path for interval joins — the formulation for
    when the interval side is TOO BIG to broadcast (``range_join``'s
    BNLJ is the right plan only for dimension-sized interval sets):

    1. explode each interval to the grid buckets it touches
       (``floor(lo/w) .. floor(hi/w)``, bounds clamped to
       [clamp_lo, clamp_hi] so open-ended sentinel intervals explode
       to a bounded bucket range — values outside the clamp range
       land on the boundary bucket on BOTH sides, so no match is
       lost).  The clamps are REQUIRED and domain-specific: set them
       to (at least) the fact value range, or everything outside
       collapses onto one boundary bucket — the skewed mega-key this
       formulation exists to avoid;
    2. equi-join fact rows on their value's bucket — a plain hash
       shuffle join Catalyst can plan, AQE-skew-split, and scale;
    3. re-apply the exact ``lo <= value < hi`` predicate as a
       residual filter (bucket coverage is a superset, so this is
       correctness, not optimization).

    Same result set as ``range_join`` row-for-row; fan-out cost is
    interval_span/bucket_width rows per interval — pick the width
    near the median interval length.
    """
    w = F.lit(bucket_width)
    clo = F.greatest(F.col(lo), F.lit(clamp_lo))
    chi = F.least(F.col(hi), F.lit(clamp_hi))
    blo = F.floor(clo / w).cast("long")
    bhi = F.floor(chi / w).cast("long")
    # an interval entirely outside the clamp range inverts the bucket
    # bounds (Spark sequence would silently DESCEND); order them so the
    # explode always ascends over the boundary bucket it clamps to
    ivx = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(F.least(blo, bhi), F.greatest(blo, bhi))),
    )
    fx = fact.withColumn(
        "_bkt",
        F.floor(
            F.greatest(F.least(F.col(value), F.lit(clamp_hi)), F.lit(clamp_lo))
            / w
        ).cast("long"),
    )
    cond = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    return fx.join(ivx, "_bkt").filter(cond).drop("_bkt")
