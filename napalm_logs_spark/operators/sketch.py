"""Fixed-size sketches: Count-Min frequencies and Bloom membership.

The engine's sketch family — HLL++ for distinct counts
(``q_sketch_distinct``), space-saving for streaming heavy hitters
(:mod:`streaming.stateful`), Count-Min for point frequency queries,
and a Bloom filter (as a set-bit position table) for membership /
incremental dedup.  The reference keeps exact per-error counters per device
(`/root/reference/napalm_logs/device.py:250-299`); at 10^12 turns an
exact per-key count table is itself a large dataset, while a CM sketch
(Cormode & Muthukrishnan 2005) answers "how often did key X occur"
from ``depth × width`` counters with a one-sided error bound:

    exact ≤ est ≤ exact + (e/width) · N   w.p. 1 − (1/e)^depth

Design for 100 TB:

* The build is ONE map-side-combined groupBy over ``depth`` exploded
  (row, bucket) pairs — the shuffle carries at most
  ``partitions × depth × width`` partial rows and the result is a
  ≤ ``depth·width``-row table no matter the corpus size.
* Sketches are mergeable by construction (counter-wise sum), so
  per-partition / per-batch sketches union + re-aggregate — the
  property that makes it a streaming/state-store citizen.
* Estimation broadcasts the (tiny) sketch against the probe keys; the
  corpus is never re-read.
* Hashing is the engine's portable md5 convention (seed-prefixed md5,
  first 8 hex digits → int): bit-identical in any engine with
  ``md5`` + hex parsing, so the DuckDB oracle replays the sketch
  exactly — the estimate is deterministic, not a tolerance check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, d: int, width: int) -> Column:
    """Row-``d`` bucket: int(md5('cm{d}:' + key)[:8], 16) % width."""
    h = F.md5(F.concat(F.lit(f"cm{d}:"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast(
        "int"
    )


def count_min_sketch(
    df: DataFrame, key_col: str = "key", *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: one row per non-empty (d, bucket) counter.

    ``inline(arrays)`` explodes each input row into its ``depth``
    (d, bucket) coordinates JVM-side, then a single algebraic groupBy
    partial-aggregates map-side — the only shuffle is counter-sized.
    Zero-count cells are implicit (estimation coalesces to 0).
    """
    key = F.col(key_col)
    coords = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _bucket(key, d, width).alias("bucket")
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.inline(coords))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each probe key: min over rows of its counters.

    The sketch is ≤ depth·width rows → broadcast side of the join; the
    probe set streams through without shuffling.  Keys absent from the
    corpus estimate as the collision mass of their buckets (≥ 0), the
    classic CMS semantics.
    """
    key = F.col(key_col)
    probes = keys.select(
        key.alias(key_col),
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def bloom_positions(key: Column, *, k: int = 5, m: int = 1 << 18) -> Column:
    """The ``k`` bit positions of a key: seed-prefixed md5, first 12 hex
    digits (48 bits — exact in BIGINT on any engine) mod ``m``."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), 1, 12
                ),
                16,
                10,
            ).cast("long")
            % m
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str = "key", *, k: int = 5, m: int = 1 << 18
) -> DataFrame:
    """Build the filter as its set-bit position table (≤ min(k·|keys|, m)
    rows).  A position table IS the sketch: union-mergeable (distinct of
    a union), broadcastable (≤ m longs), and SQL-replayable — the
    engine-portable representation of the classic bit array."""
    return (
        df.select(
            F.explode(bloom_positions(F.col(key_col), k=k, m=m)).alias("pos")
        )
        .distinct()
    )


def bloom_candidates(
    bits: DataFrame,
    df: DataFrame,
    key_col: str = "key",
    *,
    k: int = 5,
    m: int = 1 << 18,
) -> DataFrame:
    """Per distinct key: ``bloom_candidate`` = all ``k`` positions set.

    No false negatives by construction (a present key's positions are
    all set); false positives at the classic ``(1 - e^{-kn/m})^k`` rate.
    The bits table broadcasts; the probe side never shuffles."""
    probes = df.select(key_col).distinct()
    pos = probes.select(
        key_col, F.explode(bloom_positions(F.col(key_col), k=k, m=m)).alias("pos")
    )
    return (
        pos.join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg((F.count("_hit") == k).alias("bloom_candidate"))
    )


def incremental_dedup_bloom(
    batch: DataFrame,
    history: DataFrame,
    key_col: str = "key",
    *,
    k: int = 5,
    m: int = 1 << 18,
) -> DataFrame:
    """Dedup a new batch against history WITHOUT joining the history
    for definite-new rows — the incremental-crawl dedup shape.

    At 10^12-key history an exact anti-join shuffles both sides every
    batch; here history is scanned once into its position table
    (mergeable across batches — union+distinct, so it maintains
    incrementally like the streaming near-dup index), the batch probes
    the broadcast bits, and ONLY candidate keys (true dups + the
    ``(1-e^{-kn/m})^k`` false positives) pay the verify semi-join.
    Sizing ``m ≈ 16·|history|`` holds FP ≈ 0.05% at k=5 — the verify
    join is then dup-sized, not batch-sized.

    Output per batch row: ``bloom_candidate``, ``is_dup`` (verified),
    ``kept = NOT is_dup``.  ``is_dup ⇒ bloom_candidate`` always (no
    false negatives), tested.
    """
    bits = bloom_build(history, key_col, k=k, m=m)
    cand = bloom_candidates(bits, batch, key_col, k=k, m=m)
    hist_keys = history.select(key_col).distinct().withColumn(
        "_in_hist", F.lit(True)
    )
    verified = (
        cand.filter(F.col("bloom_candidate"))
        .join(hist_keys, key_col, "left")
        .select(
            key_col,
            F.coalesce(F.col("_in_hist"), F.lit(False)).alias("is_dup"),
        )
    )
    return (
        batch.join(cand, key_col, "left")
        .join(verified, key_col, "left")
        .select(
            *batch.columns,
            F.coalesce(F.col("bloom_candidate"), F.lit(False)).alias(
                "bloom_candidate"
            ),
            F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
            (~F.coalesce(F.col("is_dup"), F.lit(False))).alias("kept"),
        )
    )


def cms_vs_exact(
    df: DataFrame, key_col: str = "key", *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Exact count vs sketch estimate per distinct key.

    The validation query: emits (key, exact, cms_est, overcount).  By
    the one-sided bound ``cms_est ≥ exact`` always; the oracle replays
    both sides exactly.  At scale you run :func:`count_min_sketch`
    alone and skip the exact pass — this shape exists to *measure* the
    sketch against truth at test SFs.
    """
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(
        count_min_sketch(df, key_col, depth=depth, width=width),
        exact.select(key_col),
        key_col,
        depth=depth,
        width=width,
    )
    return exact.join(est, key_col).select(
        key_col,
        "exact",
        "cms_est",
        (F.col("cms_est") - F.col("exact")).alias("overcount"),
    )
