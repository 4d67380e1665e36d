"""Deterministic sampling / splitting for training-data pipelines.

The scale-correct way to carve train/val/test out of a 100 TB corpus
is NOT ``df.randomSplit`` (RNG state per partition — resplits when
partitioning changes, irreproducible across engines): it is a
content-addressed hash split — ``bucket = md5(salt || id) % 100`` —
which is stable under repartitioning, reproducible in any engine with
md5 (hence DuckDB-oracle-checkable), and lets you grow/shrink the
split later by moving the threshold without reshuffling history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def reserve_columns(df: DataFrame, names: tuple[str, ...], op: str) -> None:
    """Fail fast when an operator's internal helper columns collide
    with the caller's schema: building ``_h``/``_b``/... via
    ``select('*', ...)`` on a frame that already has those names would
    yield duplicate columns (AnalysisException at best, a wrong
    ``drop`` at worst).  A clear error beats either."""
    clash = sorted(set(names) & set(df.columns))
    if clash:
        raise ValueError(
            f"{op}: input columns {clash} collide with reserved internal "
            f"names {sorted(names)}; rename them before calling"
        )


def salted_hash(id_col: Column | str, salt: str) -> Column:
    """The ONE salted content-hash recipe every sampling/split/shard
    operator derives from — md5(salt || id) as lowercase hex (whose
    lexicographic order equals the numeric order of any prefix).
    Centralized so bucket membership and hash ordering can never drift
    apart across operators."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary"))


def bucket_of(hash_col: Column, n_buckets: int) -> Column:
    """Stable bucket in [0, n_buckets) from a :func:`salted_hash`
    column: first 7 hex chars as an integer, mod n_buckets.  28 bits
    of hash is plenty for split assignment and stays exact in 64-bit
    arithmetic everywhere."""
    return (
        F.conv(F.substring(hash_col, 1, 7), 16, 10).cast("long") % n_buckets
    ).cast("int")


def hash_bucket(id_col: Column | str, n_buckets: int = 100, salt: str = "split:v1") -> Column:
    """Stable bucket in [0, n_buckets) — ``bucket_of(salted_hash(...))``."""
    return bucket_of(salted_hash(id_col, salt), n_buckets)


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_pct: int = 10,
    salt: str = "split:v1",
    alias: str = "split",
) -> DataFrame:
    """Tag each row 'test' (bucket < test_pct) or 'train' — a pure
    narrow projection: no shuffle, no RNG, no state; re-running on any
    partitioning of the same data yields the identical split."""
    bucket = hash_bucket(id_col, 100, salt)
    return df.withColumn(
        alias, F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    n_buckets: int = 1000,
    salt: str = "strat:v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-mixing
    primitive (keep 50% of web, 10% of forums, ...) done the
    100 TB-correct way: a content-hash bucket per row compared to the
    stratum's rate threshold.  No RNG, no ``sampleBy`` (whose
    per-partition RNG resamples on repartitioning): the same row is
    kept or dropped forever, on any partitioning, in any engine with
    md5 — so the sample is exactly reproducible AND
    oracle-checkable.  Pure narrow projection + filter; rates move by
    shifting thresholds without touching already-materialized rows.
    """
    bucket = hash_bucket(id_col, n_buckets, salt)
    col = F.col(stratum_col)
    threshold = F.lit(int(default_rate * n_buckets))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            col == value, F.lit(int(rate * n_buckets))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def group_split(
    df: DataFrame,
    group_col: str,
    test_pct: int = 10,
    salt: str = "gsplit:v1",
    alias: str = "split",
) -> DataFrame:
    """Leakage-safe split: the hash bucket is computed on the GROUP key
    (user, domain, source document...), so every row of a group lands
    on the same side — the split you actually want for ML evaluation,
    where row-level splitting leaks near-duplicate rows of one entity
    across train/test.  Same narrow no-RNG projection as
    :func:`train_test_split`; only the hashed column differs.
    """
    bucket = hash_bucket(group_col, 100, salt)
    return df.withColumn(
        alias, F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_quota_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    salt: str = "quota:v1",
) -> DataFrame:
    """EXACT per-stratum quotas (keep exactly min(quota, n) rows per
    stratum) — the budgeted corpus-mixing primitive when the recipe
    says "2M documents of web, 500k of code", where rate-based
    sampling only hits the target in expectation.

    Rows within a stratum are ranked by content hash (md5 of the id —
    deterministic, uniform, engine-portable) with the id as tie-break,
    and the first ``quota`` kept.  One shuffle on the stratum; the
    rank compiles with a map-side WindowGroupLimit when quotas are
    small, so only ~quota rows per stratum per partition reach the
    exchange.
    """
    from pyspark.sql import Window

    c = F.col(stratum_col)
    quota = F.lit(default_quota)
    for value, q in sorted(quotas.items()):
        quota = F.when(c == value, F.lit(q)).otherwise(quota)
    rank_key = salted_hash(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(id_col))
    # two-stage filter on purpose: InferWindowGroupLimit only fires on
    # a LITERAL rank bound, so the literal max-quota filter compiles
    # the map-side WindowGroupLimit (only ~max_quota rows per stratum
    # per partition reach the exchange); the CASE filter then applies
    # the exact per-stratum quota on the survivors
    max_quota = max([default_quota, *quotas.values()])
    return (
        df.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= F.lit(max_quota))
        .filter(F.col("_qrank") <= quota)
        .drop("_qrank")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, int],
    salt: str = "mix:v1",
) -> DataFrame:
    """Deterministic TARGET-MIXTURE sampling: keep the largest subset
    of the corpus whose source proportions match ``weights`` (integer
    ratio parts, e.g. ``{"web": 6, "code": 3, "wiki": 1}`` for
    60/30/10) — the data-mixing step of a training-corpus recipe,
    where the budget is set by the SCARCEST source.

    All-integer quota math so any engine lands on identical quotas:
    with ``W = sum(weights)`` and per-source counts ``n_s``, the
    achievable total is ``T = min_s floor(n_s * W / w_s)`` and each
    source keeps ``quota_s = floor(w_s * T / W)`` rows (provably
    ``<= n_s``).  Sources not in ``weights`` are dropped; a weighted
    source with zero rows makes the whole mixture empty (the recipe is
    unsatisfiable, surfaced as an empty result rather than a silently
    skewed mix).

    Scale shape: one tiny per-source count aggregate (driver-collects
    ``#sources`` rows, same bounded-collect discipline as centroids),
    then :func:`stratified_quota_sample` — hash-ranked exact quotas,
    map-side WindowGroupLimit, one shuffle on the source column.
    """
    if not weights:
        raise ValueError("mixture_sample: weights must name at least one source")
    bad = {s: w for s, w in weights.items() if w <= 0}
    if bad:
        raise ValueError(
            f"mixture_sample: weights must be positive integers, got {bad}"
        )
    counts = {
        r["_s"]: r["_n"]
        for r in df.select(F.col(source_col).alias("_s"))
        .filter(F.col("_s").isin(list(weights)))
        .groupBy("_s")
        .agg(F.count("*").alias("_n"))
        .collect()
    }
    total_w = sum(weights.values())
    t_max = min((counts.get(s, 0) * total_w) // w for s, w in weights.items())
    quotas = {s: (w * t_max) // total_w for s, w in weights.items()}
    return stratified_quota_sample(
        df.filter(F.col(source_col).isin(list(weights))),
        source_col,
        id_col,
        quotas,
        default_quota=0,
        salt=salt,
    )


def token_budget_prefix(
    df: DataFrame,
    id_col: str,
    token_count,
    budget: int,
    salt: str = "budget:v1",
    coarse_hex: int = 2,
) -> DataFrame:
    """Keep the hash-ordered PREFIX of the corpus whose cumulative
    token count fits ``budget`` — "assemble exactly N tokens of
    training data", deterministically: membership is a pure function
    of (content hash, budget), stable under repartitioning and
    engine-portable.

    A naive ``sum() OVER (ORDER BY hash)`` is a single-partition
    global window — the plan that dies first at 100 TB.  This uses the
    same two-phase shape as ``aggregates.equi_depth_bins``: rows get a
    coarse hash-prefix bucket (16^``coarse_hex`` buckets), a tiny
    per-bucket token-sum histogram (bounded driver collect, one row
    per bucket) yields exact prefix offsets, and the running sum is
    then a PER-BUCKET window + broadcast offset — one shuffle on the
    bucket key, parallelism = bucket count (raise ``coarse_hex`` with
    the cluster).  ``token_count`` is a Column (e.g.
    ``text.token_count("text")``) so callers choose the tokenizer.
    """
    reserve_columns(df, ("_ntok", "_h", "_b", "_off", "_cum"), "token_budget_prefix")
    c = F.col(id_col)
    h = salted_hash(c, salt)
    # total function over dirty input: rows with a NULL id have no
    # stable identity and are excluded; a NULL token count contributes
    # zero tokens (the row rides along, costing nothing)
    narrow = df.filter(c.isNotNull()).select(
        "*",
        F.coalesce(token_count.cast("long"), F.lit(0)).alias("_ntok"),
        h.alias("_h"),
        F.conv(F.substring(h, 1, coarse_hex), 16, 10).cast("int").alias("_b"),
    )
    hist = {
        r["_b"]: r["_s"]
        for r in narrow.groupBy("_b").agg(F.sum("_ntok").alias("_s")).collect()
    }
    running = 0
    offsets = []
    for b in sorted(hist):
        offsets.append((b, running))
        running += int(hist[b])
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "_b int, _off long")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_b")
        .orderBy("_h", c)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        narrow.join(off, "_b")
        .withColumn("_cum", F.sum("_ntok").over(w) + F.col("_off"))
        .filter(F.col("_cum") <= F.lit(budget))
        .drop("_h", "_b", "_off", "_cum", "_ntok")
    )


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight,
    n: int,
    salt: str = "pps:v1",
    coarse_hex: int = 2,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (Madow
    1949): pick ~``n`` rows with inclusion probability proportional to
    ``weight`` — the corpus-curation "sample documents proportional to
    quality/length" step — 100% deterministically: the pseudo-random
    stream is the salted content-hash order, so membership is a pure
    function of (content, weights, n), reproducible across runs,
    partitionings, and engines (no RNG anywhere).

    Mechanics: rows are laid on a line in hash order, each occupying a
    segment of its integer weight; a boundary falls every
    ``total/n`` units and the row containing each boundary is
    selected.  Selection test per row is pure integer math —
    ``(cum*n) div total > ((cum-w)*n) div total`` — so the oracle
    re-derives membership exactly.  Rows heavier than ``total/n``
    straddle several boundaries but are selected once (sampling
    without replacement), so the output can be smaller than ``n``.

    ``rank_col`` carries the (last) boundary index the row covers —
    a ready-made stratum/shard key for the sample.

    Rows with NULL id or non-positive weight are excluded (no stable
    identity / zero inclusion mass).  Raises if ``total*n`` would
    overflow int64 (rescale weights — inclusion depends only on
    ratios).

    Scale shape: same two-phase prefix-sum as
    :func:`token_budget_prefix` — NEVER a single-partition global
    window: coarse hash-prefix buckets, a bounded per-bucket histogram
    collect (one row per bucket), broadcast offsets, per-bucket window
    sum.  One shuffle on the bucket key.
    """
    reserve_columns(
        df, ("_w", "_h", "_b", "_off", "_cum", rank_col), "pps_systematic_sample"
    )
    if n <= 0:
        raise ValueError("pps_systematic_sample: n must be positive")
    c = F.col(id_col)
    h = salted_hash(c, salt)
    w = F.col(weight) if isinstance(weight, str) else weight
    narrow = df.filter(c.isNotNull() & (w.cast("long") > 0)).select(
        "*",
        w.cast("long").alias("_w"),
        h.alias("_h"),
        F.conv(F.substring(h, 1, coarse_hex), 16, 10).cast("int").alias("_b"),
    )
    hist = {
        r["_b"]: r["_s"]
        for r in narrow.groupBy("_b").agg(F.sum("_w").alias("_s")).collect()
    }
    running = 0
    offsets = []
    for b in sorted(hist):
        offsets.append((b, running))
        running += int(hist[b])
    total = running
    if total == 0:
        return narrow.drop("_w", "_h", "_b").withColumn(
            rank_col, F.lit(None).cast("long")
        ).limit(0)
    if total * n >= 2**63:
        raise ValueError(
            f"pps_systematic_sample: total_weight*n = {total}*{n} overflows "
            "int64 — rescale weights (inclusion depends only on ratios)"
        )
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets, "_b int, _off long")
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy("_b")
        .orderBy("_h", c)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("_w").over(win) + F.col("_off")
    # SQL DIV = true int64 floor division (never a double round-trip,
    # which loses exactness above 2^53)
    k_cur = F.expr(f"(_cum * {n}) DIV {total}")
    k_prev = F.expr(f"((_cum - _w) * {n}) DIV {total}")
    return (
        narrow.join(off, "_b")
        .withColumn("_cum", cum)
        .filter(k_cur > k_prev)
        .withColumn(rank_col, k_cur)
        .drop("_h", "_b", "_off", "_cum", "_w")
    )


def cluster_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    test_pct: int = 10,
    salt: str = "cluster-split:v1",
    alias: str = "split",
) -> DataFrame:
    """Near-dup-aware train/test split: the split unit is the DUP
    CLUSTER, not the document — hash the cluster representative
    (cluster id for clustered docs, own id for singletons) so a
    near-duplicate pair can never straddle the split boundary.  The
    leakage ``group_split`` can't see: two documents that are
    near-copies but share no entity key.

    One left join onto the (id, cluster) assignment — already reduced
    far below corpus size by LSH+CC — then the same pure-projection
    hash rule as ``train_test_split``.
    """
    j = docs.join(
        clusters.select(
            F.col(id_col), F.col(cluster_col)
        ),
        id_col,
        "left",
    )
    unit = F.coalesce(F.col(cluster_col), F.col(id_col))
    bucket = hash_bucket(unit, 100, salt)
    return j.withColumn("_unit", unit).withColumn(
        alias,
        F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")),
    )
