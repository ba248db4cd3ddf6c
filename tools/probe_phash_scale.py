#!/usr/bin/env python
"""Scale-stress probe: banded Hamming near-dup join over synthetic
64-bit perceptual hashes — the candidate-volume shape check for
``imagededup.hamming_near_dup``.

Random (uniform) hashes are the WORST case for the banded join: every
16-bit band bucket fills to ≈ N/65536 rows, so candidate pairs grow as
``n_bands · N² / 2^band_bits / 2`` — quadratic in N at fixed band
width.  That is the known cost model of multi-index Hamming search
(band width must scale with corpus size: 2^band_bits ≳ N keeps buckets
O(1)); the probe makes the model VISIBLE by measuring two sizes and
comparing the wall-time ratio against the candidate-model ratio, and
asserts exactness (every planted ≤3-bit-flip pair recovered, zero
false pairs possible at Hamming ≤ 3 among 2^64-uniform hashes).

Hashes and planted near-dups are generated distributed (xxhash64 +
bit-flip masks) — no Python in the pipeline at all; the probe times
the pure join shape, not decode.

Prints ONE JSON line; run via:
    taskset -c 0-31 python tools/probe_phash_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (500_000, 2_000_000)
PLANT_FRAC_MOD = 10          # every 10th base id gets a ≤3-bit variant
VARIANT_OFF = 1 << 40


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from napalm_logs_spark.operators.imagededup import hamming_near_dup

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("probe-phash")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for n in SIZES:
        base = spark.range(n).select(
            F.col("id").alias("media_id"), F.xxhash64("id").alias("phash")
        )
        # every PLANT_FRAC_MOD-th row gets a variant with ≤3 bits
        # flipped (XOR of three deterministically chosen single-bit
        # masks; coincident picks cancel pairwise, so Hamming ∈ {1,2,3})
        def _bit(seed: int) -> str:
            return (
                "shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(xxhash64(id, {seed}), 64) AS INT))"
            )

        mask = F.expr(f"{_bit(1)} ^ {_bit(2)} ^ {_bit(3)}")
        variants = (
            spark.range(0, n, PLANT_FRAC_MOD)
            .select(
                (F.col("id") + VARIANT_OFF).alias("media_id"),
                F.xxhash64("id").bitwiseXOR(mask).alias("phash"),
            )
        )
        hashed = base.unionByName(variants)
        n_planted = n // PLANT_FRAC_MOD

        t0 = time.time()
        pairs = hamming_near_dup(hashed, max_hamming=3, n_bands=4).cache()
        n_pairs = pairs.count()
        wall = time.time() - t0

        # exactness: every planted (id, id+OFF) pair must be present;
        # uniform 64-bit hashes produce no incidental ≤3 pairs
        # (P ≈ 43745/2^64 per pair), so found == planted exactly
        found = (
            pairs.filter(F.col("id_b") == F.col("id_a") + VARIANT_OFF)
            .filter(F.col("id_a") % PLANT_FRAC_MOD == 0)
            .count()
        )
        pairs.unpersist()
        results[str(n)] = {
            "wall_s": round(wall, 2),
            "rows": n + n_planted,
            "planted": n_planted,
            "pairs_found": n_pairs,
            "planted_recovered": found,
            "exact": bool(n_pairs == found == n_planted),
        }

    r0, r1 = (results[str(s)] for s in SIZES)
    model_ratio = (SIZES[1] / SIZES[0]) ** 2  # candidates ~ N² at fixed bands
    print(json.dumps({
        "probe": "phash_banded_hamming_join",
        "n_bands": 4, "band_bits": 16, "max_hamming": 3,
        "sizes": results,
        "wall_ratio_2x_size": round(r1["wall_s"] / max(r0["wall_s"], 1e-9), 2),
        "candidate_model_ratio": model_ratio,
        "note": (
            "uniform hashes are the worst case: candidates ~ "
            "n_bands*N^2/2^band_bits; sub-model wall ratio = the join is "
            "candidate-bound, not shuffle-bound. Scale path: band_bits "
            "grows with log2(N) (wider hash or per-shard mining)."
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
