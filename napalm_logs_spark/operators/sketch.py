"""Count-Min sketch: fixed-size frequency estimation.

The third member of the engine's sketch family — HLL++ for distinct
counts (``q_sketch_distinct``), space-saving for streaming heavy
hitters (:mod:`streaming.stateful`), and this for point frequency
queries.  The reference keeps exact per-error counters per device
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
