#!/usr/bin/env python
"""Scale-stress probe: 2M-node / ~4M-edge fixed-point PageRank.

Checks the two things that kill iterative DataFrame jobs at scale:

* **Plan-depth flatness** — iterations must cost the same whether they
  are the first five or the last five (the BPE lesson: a growing
  Catalyst tree, not data volume, is the usual failure).  Measured as
  wall(10 iters) / 2 / wall(5 iters); localCheckpoint every 3
  iterations should hold this near 1.
* **Exact-mass invariant at size** — the all-integer recurrence must
  conserve fixed-point mass to within the documented floor loss
  (< iterations · (edges + nodes + 2) remainders), verified
  distributed (one aggregate, no collect of per-node state).

Graph: synth_link_graph over a dense 2M range — generated distributed,
hub collisions via the modular arithmetic, every 7th node dangling.

Prints ONE JSON line; run via:
    taskset -c 0-31 python tools/probe_pagerank_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 2_000_000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from napalm_logs_spark.operators.graph import SCALE, pagerank, synth_link_graph

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("probe-pagerank")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.range(N).withColumnRenamed("id", "doc_id")
    nodes = docs.withColumnRenamed("doc_id", "node")
    edges = synth_link_graph(docs, N)
    n_edges = edges.count()

    def run(iters: int) -> tuple[float, int, int]:
        t0 = time.time()
        r = pagerank(edges, nodes, iterations=iters).cache()
        total, mn = r.agg(F.sum("rank"), F.min("rank")).collect()[0]
        wall = time.time() - t0
        r.unpersist()
        return wall, int(total), int(mn)

    w5, _, _ = run(5)
    w10, total, mn = run(10)
    flatness = (w10 / 2) / w5
    loss = SCALE - total
    loss_bound = 10 * (n_edges + N + 2)
    teleport = ((100 - 85) * (SCALE // N)) // 100

    print(json.dumps({
        "probe": "pagerank_2M_nodes",
        "nodes": N,
        "edges": int(n_edges),
        "iterations": 10,
        "wall_s_5it": round(w5, 2),
        "wall_s_10it": round(w10, 2),
        "iteration_flatness_10v5": round(flatness, 3),
        "mass_total": total,
        "mass_floor_loss": int(loss),
        "loss_within_bound": bool(0 <= loss <= loss_bound),
        "min_rank": mn,
        "min_rank_ge_teleport": bool(mn >= teleport),
        "edge_iters_per_sec": round(n_edges * 10 / w10),
        "cores": cores,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
