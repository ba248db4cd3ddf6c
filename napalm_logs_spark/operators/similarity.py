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
* :func:`ivf_cosine_topk` — IVF scale path: deterministic seeded
  k-means centroids trained on a bounded driver-side sample, broadcast
  as plan literals; corpus rows land in one inverted list, queries
  probe the ``nprobe`` nearest lists, exact cosine only within probed
  lists.  At cluster scale the centroid count bounds the broadcast
  (C×dim doubles) and the shuffle is a hash join on ``cluster``.
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


def _train_centroids(
    sample: np.ndarray, n_clusters: int, seed: int, iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd k-means on unit-normalized sample vectors.

    Driver-side numpy on a bounded sample (the standard IVF recipe —
    training data never exceeds the sample cap regardless of corpus
    size); empty clusters re-seeded deterministically from the sample.
    """
    rng = np.random.RandomState(seed)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    unit = sample / np.where(norms > 0, norms, 1.0)
    idx = rng.choice(len(unit), size=min(n_clusters, len(unit)), replace=False)
    cent = unit[np.sort(idx)].copy()
    for _ in range(iters):
        sims = unit @ cent.T                      # cosine on unit vectors
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                cent[c] = m / n if n > 0 else cent[c]
            else:                                 # re-seed dead centroid
                cent[c] = unit[rng.randint(len(unit))]
    return cent


def _centroid_sims(emb_col, centroids: np.ndarray):
    """Array column: cosine(emb, centroid_i) for each centroid (JVM-side;
    centroids are plan literals ≈ a broadcast of C×dim doubles)."""
    n = _norm(emb_col)
    dots = [
        _dot(emb_col, F.array(*[F.lit(float(v)) for v in c])) for c in centroids
    ]
    return F.transform(
        F.array(*dots), lambda d: F.when(n > 0, d / n).otherwise(F.lit(0.0))
    )


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid inverted-list id per row (argmax of cosine;
    ties break to the lowest cluster id).  One narrow pass, no shuffle."""
    sims = _centroid_sims(F.col(emb_col), centroids)
    return df.withColumn(
        out_col, (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``nprobe`` nearest inverted
    lists per query, exact cosine only within probed lists.

    Recall < 1 by construction (verified against brute force in tests).
    The candidate join shuffles on ``cluster`` — C keys, so at scale
    pick C ≈ sqrt(corpus_rows) to balance list size vs probe cost.
    """
    # TakeOrderedAndProject (orderBy+limit fuses — no full sort): a
    # deterministic bounded sample regardless of partitioning
    sample_pdf = (
        corpus.select(id_col, emb_col).orderBy(id_col).limit(sample_cap).toPandas()
    )
    sample = np.array([np.asarray(v, dtype="float64") for v in sample_pdf[emb_col]])
    cent = _train_centroids(sample, n_clusters, seed)

    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb")),
        cent, "c_emb",
    )
    qsims = _centroid_sims(F.col("q_emb"), cent)
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"))
        .withColumn("_sims", qsims)
        .withColumn(
            "cluster",
            F.explode(
                F.slice(
                    F.reverse(F.array_sort(
                        F.transform(
                            F.col("_sims"),
                            lambda s, i: F.struct(s.alias("s"), i.alias("i")),
                        )
                    )),
                    1, nprobe,
                ).getField("i")
            ),
        )
        .select("query_id", "q_emb", "cluster")
    )
    cand = c.join(F.broadcast(q), "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
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
