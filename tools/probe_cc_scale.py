#!/usr/bin/env python
"""Scale-stress probe: 10M-edge connected components (pointer-doubling
duplicate_clusters) — the round-3 analog of round 2's 200-batch
compaction probe.

The graph is adversarial for label propagation: a few very LONG chains
(deep diameter — the pathological near-dup shape: templated documents
each a near-copy of the previous) plus many small stars (the common
shape) plus one large star (hot representative).  Plain min-propagation
needs O(diameter) rounds; pointer doubling must converge in
O(log diameter) and the probe asserts both the round count and exact
cluster correctness (every chain/star must collapse to its minimum id).

Prints ONE JSON line; run via:
    taskset -c 0-31 python tools/probe_cc_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHAINS = 20
CHAIN_LEN = 100_000          # diameter 10^5 -> needs doubling
N_STARS = 200_000
STAR_SIZE = 40
BIG_STAR = 16_000            # one hot component
# edges: 20*99_999 + 200_000*39 + 16_000 ≈ 9.82M


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from napalm_logs_spark.operators.docdedup import duplicate_clusters

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("probe-cc")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # id layout: chains at [0, N_CHAINS*CHAIN_LEN); stars after; the big
    # star last.  All edges generated distributed (sequence+explode) —
    # no driver-side edge list.
    chain_base = 0
    star_base = N_CHAINS * CHAIN_LEN
    big_base = star_base + N_STARS * STAR_SIZE

    chains = (
        spark.range(N_CHAINS)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(CHAIN_LEN - 2))).alias("i"),
            (F.col("id") * CHAIN_LEN + chain_base).alias("b"),
        )
        .select(
            (F.col("b") + F.col("i")).alias("doc_a"),
            (F.col("b") + F.col("i") + 1).alias("doc_b"),
        )
    )
    stars = (
        spark.range(N_STARS)
        .select(
            F.explode(F.sequence(F.lit(1), F.lit(STAR_SIZE - 1))).alias("i"),
            (F.col("id") * STAR_SIZE + star_base).alias("c"),
        )
        .select(F.col("c").alias("doc_a"), (F.col("c") + F.col("i")).alias("doc_b"))
    )
    big = spark.range(1, BIG_STAR + 1).select(
        F.lit(big_base).alias("doc_a"), (F.col("id") + big_base).alias("doc_b")
    )
    pairs = chains.unionByName(stars).unionByName(big)
    n_edges = pairs.count()

    t0 = time.time()
    out = duplicate_clusters(pairs, max_iterations=25).cache()
    n_nodes = out.count()
    wall = time.time() - t0

    # exact correctness, verified distributed (no collect of 10M rows):
    # every node's cluster must equal the component's minimum id, which
    # the id layout makes computable in closed form
    wrong = out.filter(
        ~(
            (
                (F.col("doc_id") < star_base)
                & (F.col("cluster_id") == (F.floor(F.col("doc_id") / CHAIN_LEN) * CHAIN_LEN))
            )
            | (
                (F.col("doc_id") >= star_base)
                & (F.col("doc_id") < big_base)
                & (F.col("cluster_id") == (F.floor((F.col("doc_id") - star_base) / STAR_SIZE) * STAR_SIZE + star_base))
            )
            | ((F.col("doc_id") >= big_base) & (F.col("cluster_id") == big_base))
        )
    ).count()
    n_clusters = out.select("cluster_id").distinct().count()

    print(json.dumps({
        "probe": "cc_pointer_doubling_10M_edges",
        "edges": int(n_edges),
        "nodes": int(n_nodes),
        "clusters": int(n_clusters),
        "expected_clusters": N_CHAINS + N_STARS + 1,
        "wrong_labels": int(wrong),
        "max_chain_diameter": CHAIN_LEN,
        "wall_s": round(wall, 2),
        "edges_per_sec": round(n_edges / wall),
        "cores": cores,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
