"""Similarity search: exact brute-force cosine top-k + LSH approximate
variant (recall measured against brute force) + embedding near-dup."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from napalm_logs_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup,
    ivf_assign,
    ivf_cosine_topk,
    lsh_cosine_topk,
    _train_centroids,
)

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5)


def test_cosine_topk_matches_numpy(spark, emb, queries):
    got = cosine_topk(emb, queries, k=5).collect()
    vecs = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    for qid in range(5):
        q = vecs[qid]
        sims = {
            vid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
            for vid, v in vecs.items()
            if vid != qid
        }
        expected = sorted(sims, key=lambda v: (-round(sims[v], 6), v))[:5]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
        assert mine == expected, qid


def test_lsh_recall_against_bruteforce(emb, queries):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    # testdata embeddings are near-orthogonal random vectors (max pairwise
    # cosine ≈0.33): the hardest regime for hyperplane LSH — few planes,
    # many tables needed for recall
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_cosine_topk(emb, queries, dim=DIM, k=10, n_planes=4, n_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # approximate, but must be useful


def test_embedding_near_dup_planted(spark):
    rng = np.random.RandomState(7)
    v = rng.normal(size=DIM)
    rows = [
        (0, (v / np.linalg.norm(v)).tolist(), 0),
        (1, (v / np.linalg.norm(v) + 0.001).tolist(), 0),     # near dup
        (2, rng.normal(size=DIM).tolist(), 0),                # unrelated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {(r.id_a, r.id_b) for r in embedding_near_dup(df, dim=DIM, threshold=0.99).collect()}
    assert got == {(0, 1)}


def test_ivf_recall_against_bruteforce(emb, queries):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    # near-orthogonal random embeddings: clusters are weak, so probe
    # half the lists — the scale knob a real corpus would not need
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_cosine_topk(
            emb, queries, dim=DIM, k=10, n_clusters=8, nprobe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall


def test_ivf_full_probe_equals_bruteforce(emb, queries):
    """nprobe == n_clusters degenerates to exact search — same result
    set as brute force (rank ties broken identically)."""
    exact = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in cosine_topk(emb, queries, k=5).collect()
    )
    full = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_cosine_topk(
            emb, queries, dim=DIM, k=5, n_clusters=4, nprobe=4
        ).collect()
    )
    assert full == exact


def test_ivf_assign_deterministic_under_repartition(emb):
    cent = _train_centroids(
        np.array([np.array(r.embedding, dtype="float64") for r in emb.limit(256).collect()]),
        n_clusters=8, seed=42,
    )
    a = {r.vec_id: r.cluster for r in ivf_assign(emb, cent).collect()}
    b = {
        r.vec_id: r.cluster
        for r in ivf_assign(emb.repartition(13), cent).collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(8))


def test_ivf_candidate_join_shuffles_on_cluster_not_cartesian(emb, queries):
    plan = (
        ivf_cosine_topk(emb, queries, dim=DIM, k=5, n_clusters=8, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan


def test_topk_plan_broadcasts_queries(emb, queries):
    plan = (
        cosine_topk(emb, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
