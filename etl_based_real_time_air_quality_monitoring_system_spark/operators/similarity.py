"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k as the exact baseline, random-hyperplane LSH
as the approximate scale path.

Spark-first: the dot product / norms are higher-order array functions
(``zip_with`` + ``aggregate``) — JVM-evaluated, no Python, no UDF.

Scale design:
- brute force is ONE narrow projection + TakeOrderedAndProject: fine
  whenever k is small, even at 10^9 vectors, because nothing shuffles
  but the per-partition top-k heaps;
- for repeated queries, precompute ``with_norm`` once (store the norm
  column) and broadcast the query set;
- LSH buckets cut the scanned fraction to ~(matching buckets)/(2^bits)
  at a recall cost; signatures come from fixed seeded hyperplanes so
  results are deterministic and testable.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def vec_lit(values: Sequence[float]) -> Column:
    """A literal array<double> column from a Python vector."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i via zip_with + aggregate — left-to-right fold, so the
    float summation order is deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Exact cosine top-k against one query vector.  Plans as
    scan -> project(cosine) -> TakeOrderedAndProject(k): no shuffle,
    each task keeps a k-heap."""
    emb = _as_double_array(emb_col)
    q = vec_lit(query_vec)
    scored = df.select(
        F.col(id_col), F.round(cosine(emb, q), scale).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def knn_join(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    query_emb_col: str,
    k: int = 5,
    scale: int = 6,
) -> DataFrame:
    """k nearest corpus vectors for EVERY query vector: broadcast the
    (small) query set, score all pairs, keep top-k per query with a
    per-query window — the distributed analog of a batched ANN query.
    """
    from pyspark.sql import Window

    corpus = df.select(
        F.col(id_col).alias("corpus_id"), _as_double_array(emb_col).alias("_ce")
    )
    qs = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double_array(query_emb_col).alias("_qe")
    )
    scored = corpus.crossJoin(F.broadcast(qs)).select(
        "query_id",
        "corpus_id",
        F.round(cosine(F.col("_ce"), F.col("_qe")), scale).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.col("corpus_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# ----------------------------------------------------------------- LSH

def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Fixed seeded Gaussian hyperplanes — deterministic across runs
    and machines (NumPy's MT19937 stream is specified)."""
    return np.random.RandomState(seed).randn(n_planes, dim)


def lsh_signature(emb: Column, planes: np.ndarray) -> Column:
    """Sign-of-dot-product bit signature packed into a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bit = F.when(dot(emb, vec_lit(plane)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = sig + bit
    return sig


def lsh_topk(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    max_hamming: int = 2,
    seed: int = 42,
    scale: int = 6,
) -> DataFrame:
    """Approximate cosine top-k: keep only candidates whose bucket
    signature is within ``max_hamming`` bits of the query's, then score
    exactly.  Scanned fraction ≈ Σ_{i<=h} C(b,i)/2^b; recall rises
    with ``max_hamming`` (see tests for the measured recall floor)."""
    qv = np.asarray(list(query_vec), dtype=float)
    planes = hyperplanes(len(qv), n_planes, seed)
    query_sig = int(sum(1 << i for i, p in enumerate(planes) if float(p @ qv) > 0))
    emb = _as_double_array(emb_col)
    with_sig = df.select(F.col(id_col), emb.alias("_e")).withColumn(
        "_sig", lsh_signature(F.col("_e"), planes)
    )
    near = with_sig.filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(query_sig))) <= max_hamming
    )
    scored = near.select(
        F.col(id_col), F.round(cosine(F.col("_e"), vec_lit(qv)), scale).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)
