"""Similarity search: brute-force exactness + LSH recall floor."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
    brute_force_topk,
    knn_join,
    lsh_topk,
)
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def query_vec(emb):
    row = emb.filter(F.col("vec_id") == 0).head()
    return [float(x) for x in row["embedding"]]


def _numpy_topk(emb, query_vec, k):
    rows = emb.select("vec_id", "embedding").collect()
    q = np.asarray(query_vec)
    scores = {
        r["vec_id"]: float(
            np.dot(r["embedding"], q)
            / (np.linalg.norm(r["embedding"]) * np.linalg.norm(q))
        )
        for r in rows
    }
    return sorted(scores, key=lambda i: (-scores[i], i))[:k]


def test_brute_force_matches_numpy(emb, query_vec):
    got = [r["vec_id"] for r in brute_force_topk(emb, "vec_id", "embedding", query_vec, k=10).collect()]
    assert got == _numpy_topk(emb, query_vec, 10)


def test_brute_force_self_is_top1(emb, query_vec):
    top = brute_force_topk(emb, "vec_id", "embedding", query_vec, k=1).collect()[0]
    assert top["vec_id"] == 0 and top["cosine_sim"] == 1.0


def test_knn_join_per_query(emb):
    qs = emb.filter(F.col("vec_id") < 3)
    out = knn_join(emb, qs, "vec_id", "embedding", "vec_id", "embedding", k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, neighbors in by_q.items():
        assert len(neighbors) == 5
        # self-match is rank 1 with cosine 1.0
        best = max(neighbors, key=lambda r: r["cosine_sim"])
        assert best["corpus_id"] == qid and best["cosine_sim"] == 1.0


def test_lsh_topk_recall(emb, query_vec):
    exact = set(_numpy_topk(emb, query_vec, 10))
    approx = {
        r["vec_id"]
        for r in lsh_topk(
            emb, "vec_id", "embedding", query_vec, k=10, max_hamming=6
        ).collect()
    }
    recall = len(exact & approx) / 10
    # these embeddings are near-uniform (weak cluster structure), the
    # adversarial case for sign-LSH: measured recall at hamming<=6 of
    # 12 planes is 0.7 — assert the floor just below it so regressions
    # in the signature/bucketing logic surface
    assert recall >= 0.6, f"LSH recall {recall} below floor"
    assert 0 in approx  # the query vector itself always survives
