#!/usr/bin/env python
"""Scale-stress probe: one-pass PCA moment aggregation linearity.

The 100 TB claim behind `pca_fit` is that the whole fit is ONE corpus
pass whose shuffle is ``partitions x (dim^2+dim+1)`` longs — corpus-size
independent — plus a corpus-independent driver eigh.  This probe makes
that measurable on a corpus ~1000x the test tables: N synthetic vectors
(seeded, distributed generation, no driver materialization), the fit
timed at N/4 and N.

Expected shape (asserted): fit wall time grows ~linearly in rows
(ratio within [2.5, 6] for a 4x row growth — sublinear-to-linear band
with fixed per-job overhead), and the projection pass is a narrow
no-shuffle matmul.  Prints ONE JSON line.  Run solo:

    python tools/probe_pca_scale.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def synth(spark, n):
    from pyspark.sql import functions as F

    centers = 16
    return (
        spark.range(n)
        .withColumn("_c", (F.col("id") % centers).cast("int"))
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda j: (
                    F.sin(F.col("_c") * 3.7 + j * 0.91)
                    + F.sin(F.col("id") * 0.000317 + j * 1.13) * 0.3
                ).cast("float"),
            ),
        )
        .select(F.col("id").alias("vec_id"), "embedding")
    )


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("pca-scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "64g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from napalm_logs_spark.operators.similarity import pca_fit, pca_project

    emb = synth(spark, N).repartition(32).persist()
    emb.count()
    quarter = synth(spark, N // 4).repartition(32).persist()
    quarter.count()

    # untimed warmup: python-worker spawn + JIT would otherwise be
    # charged to the quarter run and flatten the linearity signal
    pca_fit(quarter, 4)

    t0 = time.time()
    pca_fit(quarter, 4)
    fit_quarter_s = time.time() - t0

    t0 = time.time()
    mean, comps, evr = pca_fit(emb, 4)
    fit_s = time.time() - t0

    t0 = time.time()
    n_proj = pca_project(emb, mean, comps).filter("pc[0] is not null").count()
    project_s = time.time() - t0

    ratio = fit_s / fit_quarter_s
    out = {
        "probe": "pca_scale",
        "n": N,
        "dim": DIM,
        "fit_quarter_s": round(fit_quarter_s, 2),
        "fit_s": round(fit_s, 2),
        "linearity_ratio_4x_rows": round(ratio, 2),
        "project_s": round(project_s, 2),
        "fit_rows_per_s": round(N / fit_s),
        "projected_rows": n_proj,
        "evr_top4": [round(float(v), 4) for v in evr],
        "ok": bool(2.5 <= ratio <= 6.0 and n_proj == N),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
