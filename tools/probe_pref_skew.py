#!/usr/bin/env python
"""Scale-stress probe: hot-prompt preference pairing.

Adversarial input for :func:`operators.sft.preference_pairs`: one
shared prompt covering most of the corpus (the "hi" greeting that
millions of conversations open with).  The pairing is two rank-1
window passes over ``prompt_fp`` — a hot prompt group is ONE
reducer's sort emitting ONE row, never a cross join — so wall time
must grow ~linearly in conversation count while the hot group's share
grows from 10% to 90%.

Prints ONE JSON line with per-size timings and the hot/uniform ratio.
Run: python tools/probe_pref_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, n_convs: int, hot_frac: float):
    """Two-turn conversations: conv i opens with prompt text
    'hot greeting' (first hot_frac share) or a per-conv unique prompt,
    then one agent reply whose length is the score source."""
    from pyspark.sql import functions as F

    base = spark.range(n_convs).select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
        (F.col("id") < int(n_convs * hot_frac)).alias("_hot"),
        F.col("id"),
    )
    user = base.select(
        "conv_id",
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.when(F.col("_hot"), F.lit("hot greeting"))
        .otherwise(F.concat(F.lit("unique prompt "), F.col("id")))
        .alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        "id",
    )
    agent = base.select(
        "conv_id",
        F.lit(1).alias("turn_idx"),
        F.lit("agent").alias("role"),
        F.repeat(F.lit("x"), (F.pmod(F.col("id"), F.lit(997)) + 1).cast("int")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:01").cast("timestamp").alias("ts"),
        "id",
    )
    return user.unionByName(agent).drop("_hot", "id")


def run_once(spark, n_convs: int, hot_frac: float) -> float:
    from pyspark.sql import functions as F

    from napalm_logs_spark.operators.sft import preference_pairs

    tdf = build(spark, n_convs, hot_frac)
    scores = (
        tdf.filter(F.col("role") == "agent")
        .groupBy("conv_id")
        .agg(F.sum(F.length("text")).cast("double").alias("score"))
    )
    t0 = time.time()
    out = preference_pairs(tdf, scores)
    n = out.count()
    dt = time.time() - t0
    # hot group -> exactly one pair; unique prompts -> none
    assert n == 1, n
    return dt


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-pref-skew")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [200_000, 400_000, 800_000]
    timings = {}
    for n in sizes:
        run_once(spark, 50_000, 0.5)  # warm
        timings[n] = {
            "hot90_s": round(run_once(spark, n, 0.9), 3),
            "uniform10_s": round(run_once(spark, n, 0.1), 3),
        }
    # linearity: 4x convs should cost ~4x, not 16x (quadratic blow-up)
    growth = timings[sizes[-1]]["hot90_s"] / max(timings[sizes[0]]["hot90_s"], 1e-9)
    skew_ratio = timings[sizes[-1]]["hot90_s"] / max(
        timings[sizes[-1]]["uniform10_s"], 1e-9
    )
    print(json.dumps({
        "probe": "preference_pairs hot-prompt skew",
        "sizes": sizes,
        "timings_s": timings,
        "growth_4x_convs": round(growth, 2),
        "hot_vs_uniform_ratio_at_max": round(skew_ratio, 2),
        "verdict": "linear" if growth < 8 and skew_ratio < 3 else "SUSPECT",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
