"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set against the corpus; dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, no Python); per-query top-k via window.
* :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH
  buckets (deterministic seeded planes broadcast as literals); only
  same-bucket pairs pay the cosine; multi-probe via several tables.
  Recall < 1 by construction; verified against brute force in tests.
* :func:`embedding_near_dup` — near-duplicate pairs by cosine ≥ τ
  within LSH buckets (embedding-space analog of MinHash dedup).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # element-wise double arithmetic (float*float would lose precision
    # vs. any double-computing oracle)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_unit_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    n = _norm(F.col(col))
    return df.withColumn(
        "_unit",
        F.when(n > 0, F.transform(F.col(col), lambda x: x / n)).otherwise(F.col(col)),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (broadcast the queries).

    Output: (query_id, neighbor_id, cosine, rank) — excludes self-match.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb")
    )
    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        _norm(F.col("q_emb")) * _norm(F.col("c_emb"))
    )
    scored = joined.withColumn("cosine", F.round(cos, 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _random_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype("float64")


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
               emb_col: str = "embedding", out_col: str = "bucket") -> DataFrame:
    """Random-hyperplane signature: bit i = sign(emb · plane_i).

    The planes are literal arrays in the plan (broadcast-by-construction,
    ~n_planes×dim doubles).  One pass, no shuffle.
    """
    planes = _random_planes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[i]])
        bit = (_dot(F.col(emb_col), plane) > 0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    return df.withColumn(out_col, sig)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same bucket in ≥1 of ``n_tables``
    hash tables, then exact cosine on candidates only."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"))
    cand = None
    for t in range(n_tables):
        cb = lsh_bucket(c, dim, n_planes, seed + t, "c_emb", "bucket")
        qb = lsh_bucket(q, dim, n_planes, seed + t, "q_emb", "bucket")
        pairs = cb.join(F.broadcast(qb), "bucket").filter(
            F.col("neighbor_id") != F.col("query_id")
        ).select("query_id", "neighbor_id", "q_emb", "c_emb")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        _norm(F.col("q_emb")) * _norm(F.col("c_emb"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) via one LSH
    table + in-bucket exact cosine.  (doc_a < doc_b)."""
    b = lsh_bucket(
        df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb")),
        dim, n_planes, seed, "emb",
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
    )
    cos = _dot(F.col("l.emb"), F.col("r.emb")) / (
        _norm(F.col("l.emb")) * _norm(F.col("r.emb"))
    )
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), "cosine"
        )
    )
