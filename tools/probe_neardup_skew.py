#!/usr/bin/env python
"""Scale-stress probe: skewed-bucket streaming near-dup drain.

Adversarial input for the cross-batch LSH filter: every batch lands
1,000 mutually-dissimilar-enough survivors in the SAME (table, bucket)
key (near-copies of one base vector kept by a high threshold), plus
random-bucket filler.  Without the round-3 index-side cap each new hot
row compares against EVERY prior survivor in the bucket — per-batch
work grows linearly with the stream (quadratic cumulative).  With
``max_index_bucket`` the anchor set is bounded, so per-batch wall time
must stay FLAT.

The probe runs a short capped-vs-uncapped contrast (8 batches) to show
the divergence, then a 24-batch capped drain asserting flatness, and
prints ONE JSON line.  Run via:
    taskset -c 0-31 python tools/probe_neardup_skew.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIM = 64
HOT_PER_BATCH = 1_000
FILLER_PER_BATCH = 4_000
SCHEMA = "vec_id long, embedding array<float>"


def _batch_pdf(batch_id: int, base: np.ndarray) -> "pd.DataFrame":
    import pandas as pd

    rng = np.random.RandomState(1000 + batch_id)
    hot = base + 0.001 * rng.randn(HOT_PER_BATCH, DIM).astype("float32")
    filler = rng.randn(FILLER_PER_BATCH, DIM).astype("float32")
    n = HOT_PER_BATCH + FILLER_PER_BATCH
    ids = np.arange(batch_id * n, (batch_id + 1) * n)
    vecs = np.vstack([hot, filler]).astype("float32")
    return pd.DataFrame({
        "vec_id": ids,
        "embedding": [v.tolist() for v in vecs],
    })


def drain(spark, n_batches: int, max_index_bucket: int, tag: str):
    from napalm_logs_spark.streaming.neardup_stream import near_dup_filter_batch

    base = np.random.RandomState(7).randn(DIM).astype("float32")
    work = tempfile.mkdtemp(prefix=f"probe_nd_{tag}_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    metrics = f"{work}/m.jsonl"
    fn = near_dup_filter_batch(
        f"{work}/out", f"{work}/idx", DIM,
        threshold=1.01,              # keep everything: the hot bucket GROWS
        max_index_bucket=max_index_bucket,
        metrics_jsonl=metrics,
    )
    walls = []
    for b in range(n_batches):
        bdf = spark.createDataFrame(_batch_pdf(b, base), SCHEMA)
        t0 = time.time()
        fn(bdf, b)
        walls.append(round(time.time() - t0, 2))
    lines = [json.loads(x) for x in open(metrics)]
    shutil.rmtree(work, ignore_errors=True)
    return walls, lines


def main() -> None:
    from pyspark.sql import SparkSession

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("probe-neardup-skew")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # contrast: 8 batches capped vs uncapped (uncapped = cap above any
    # accumulated bucket, so the down-sample never engages)
    walls_cap, _ = drain(spark, 8, 2_000, "cap8")
    walls_uncap, _ = drain(spark, 8, 10_000_000, "uncap8")

    # endurance: 24 capped batches; flatness = last-third mean vs
    # first-third mean
    walls, lines = drain(spark, 24, 2_000, "cap24")
    first = sum(walls[:8]) / 8
    last = sum(walls[-8:]) / 8
    rows_total = 24 * (HOT_PER_BATCH + FILLER_PER_BATCH)
    out = {
        "probe": "neardup_skewed_hot_bucket_drain",
        "rows_per_batch": HOT_PER_BATCH + FILLER_PER_BATCH,
        "hot_rows_per_batch": HOT_PER_BATCH,
        "contrast_8_batches": {
            "capped_walls_s": walls_cap,
            "uncapped_walls_s": walls_uncap,
            "capped_total_s": round(sum(walls_cap), 2),
            "uncapped_total_s": round(sum(walls_uncap), 2),
        },
        "capped_24_batches": {
            "walls_s": walls,
            "first_third_mean_s": round(first, 2),
            "last_third_mean_s": round(last, 2),
            "flatness_ratio": round(last / first, 2),
            "rows_per_sec": round(rows_total / sum(walls)),
            "final_gauges": {
                k: lines[-1][k]
                for k in ("index_oversize_buckets", "index_anchors_sampled_out")
            },
            "total_kept": sum(x["n_kept"] for x in lines),
        },
        "cores": cores,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
