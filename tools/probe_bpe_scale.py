#!/usr/bin/env python
"""Scale-stress probe: BPE training iteration-cost flatness.

The trainer's scale claim is that every merge iteration costs the same
bounded work (one histogram-sized Arrow pass + one pair-count aggregate
+ a 1-row argmax) regardless of how many merges have already run — the
O(1)-plan-depth property the per-generation localCheckpoint buys.  The
failure mode it guards against is real and was measured during
development: an un-checkpointed conditional merge layer grows the
Catalyst tree 3^k per merge and OOMs the JVM heap at ~8 merges.

This probe trains 120 merges on the sf0.1 documents corpus (10x the
oracle mirror's corpus, 3x its merge count) and asserts per-iteration
wall time stays flat: mean(last 20 iters) < 2x mean(iters 11-30)
(first 10 excluded as JVM/Arrow warmup).  Exact correctness at smaller
scales is separately gated by the independent-python goldens and the
partitioning-invariance test.

Prints ONE JSON line; run via:
    taskset -c 0-31 python tools/probe_bpe_scale.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MERGES = 120
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession

    from napalm_logs_spark.operators.bpe import bpe_train

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    iters: list[float] = []
    t0 = time.time()
    merges = bpe_train(docs, n_merges=N_MERGES, iter_seconds=iters).collect()
    wall = time.time() - t0
    if len(iters) < 31:
        # early min-freq stop on a sparse corpus: report, don't crash
        print(json.dumps({
            "probe": "bpe_train_iteration_flatness", "sf_dir": SF_DIR,
            "n_merges_learned": len(merges), "wall_s": round(wall, 1),
            "flat": None,
            "note": "fewer than 31 iterations — flatness not measurable",
        }))
        spark.stop()
        return
    early = statistics.mean(iters[10:30])
    late = statistics.mean(iters[-20:])
    out = {
        "probe": "bpe_train_iteration_flatness",
        "sf_dir": SF_DIR,
        "n_docs": docs.count(),
        "n_merges_requested": N_MERGES,
        "n_merges_learned": len(merges),
        "wall_s": round(wall, 1),
        "merges_per_sec": round(len(merges) / wall, 2),
        "iter_mean_11_30_s": round(early, 3),
        "iter_mean_last20_s": round(late, 3),
        "late_over_early": round(late / early, 3),
        "flat": late < 2 * early,
        "last_merge": {
            "rank": merges[-1]["merge_rank"],
            "pair": merges[-1]["left"] + "+" + merges[-1]["right"],
            "count": merges[-1]["pair_count"],
        } if merges else None,
    }
    spark.stop()
    print(json.dumps(out))
    if not out["flat"]:
        raise SystemExit("iteration cost grew — plan depth is not O(1)")


if __name__ == "__main__":
    main()
