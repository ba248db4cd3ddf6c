"""Streaming GRPO/RLOO baselines: per-batch stat slices, merge-on-read.

An asynchronous RLHF run produces rollouts continuously, and a
rollout's group may not arrive in one micro-batch: Best-of-N workers
finish at different times, retries trickle in, a hot prompt's group
spans triggers.  The group-relative advantage
(:func:`operators.ranking.group_advantages`) depends only on the
group's exact integer sufficient statistics — ``n``, ``Σr``, ``Σr²``
— and those are counter-wise SUM-mergeable, exactly the property that
made Count-Min/HLL/histogram/drift streaming citizens
(:mod:`streaming.sketch_stream`).  So the same recipe applies
verbatim:

* each micro-batch reduces to its per-group stat rows, written as an
  idempotent ``batch_id=<n>`` parquet slice (the engine's
  exactly-once sink layout — a replayed batch overwrites its own
  slice and nothing else; the partition name is deliberately NOT
  underscore-prefixed, because Hadoop path filters hide ``_``/``.``
  prefixed paths and the slice table must stay readable by plain
  ``spark.read.parquet(stats_dir)`` partition discovery and external
  compaction tooling);
* the live baseline table is the SUM over committed slices, equal BY
  INTEGER ASSOCIATIVITY to the whole-input statistics — no state
  store, resumable from checkpoint, compactable like any slice table;
* advantages for any rollout set are one hash join against the merged
  baseline (:func:`advantages_from_stats`), sharing the exact final
  expression tree with the batch operator
  (:func:`operators.ranking._advantage_select`), so
  stream-accumulated advantages are bit-identical to a batch pass
  over the same rollouts — tested.

At 10^9 rollouts/day the slice shuffle is group-sized (the sampler's
prompt count), not rollout-sized; the merged table is one row per
prompt group; and a training step that needs advantages for its
micro-batch joins rollouts → baseline on the group key (broadcastable
while the active-prompt set is bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ranking import _advantage_select


def group_stats(
    df: DataFrame, group_col: str = "prompt_id", reward_col: str = "reward"
) -> DataFrame:
    """Exact integer sufficient statistics per rollout group."""
    r = F.col(reward_col).cast("long")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r).alias("sum_r"),
        F.sum(r * r).alias("sum_r2"),
    )


def adv_batch_sink(
    stats_dir: str, group_col: str = "prompt_id", reward_col: str = "reward"
):
    """foreachBatch function: reduce the micro-batch to its group-stat
    rows and overwrite this batch's slice (idempotent under replay)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        group_stats(batch_df, group_col, reward_col).write.mode(
            "overwrite"
        ).parquet(f"{stats_dir}/batch_id={batch_id}")

    return _write


def read_merged_stats(spark, stats_dir: str, group_col: str = "prompt_id") -> DataFrame:
    """SUM over all committed batch slices — by integer associativity
    this equals :func:`group_stats` over the whole stream."""
    df = spark.read.option("basePath", stats_dir).parquet(
        f"{stats_dir}/batch_id=*"
    )
    return df.groupBy(group_col).agg(
        F.sum("n").alias("n"),
        F.sum("sum_r").alias("sum_r"),
        F.sum("sum_r2").alias("sum_r2"),
    )


def advantages_from_stats(
    rollouts: DataFrame,
    stats: DataFrame,
    group_col: str = "prompt_id",
    id_col: str = "rollout_id",
    reward_col: str = "reward",
) -> DataFrame:
    """Join rollouts to a (possibly stream-accumulated) baseline table
    and emit the same columns as ``group_advantages`` — the same final
    expression tree, so equal stats imply bit-identical advantages.

    The join is LEFT: a rollout whose group has no committed stats yet
    (its slice hasn't landed) is NOT dropped — it surfaces with NULL
    ``n``/``adv_num``/``var_num``/advantages, so a trainer can see and
    defer the not-yet-merged groups instead of silently losing them.
    Once the group's slice commits, a re-join yields its exact values.
    """
    joined = rollouts.select(
        F.col(group_col),
        F.col(id_col),
        F.col(reward_col).cast("long").alias("_r"),
    ).join(
        stats.select(
            group_col,
            "n",
            F.col("sum_r").alias("_sum_r"),
            F.col("sum_r2").alias("_sum_r2"),
        ),
        group_col,
        "left",
    )
    return _advantage_select(joined, group_col, id_col)


def run_adv_stream_once(
    spark,
    source_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
    schema,
    group_col: str = "prompt_id",
    reward_col: str = "reward",
    *,
    timeout_s: float | None = 600,
) -> None:
    """Drain all available rollout files into per-batch stat slices
    (availableNow trigger), exactly-once under replay."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(adv_batch_sink(stats_dir, group_col, reward_col))
        .trigger(availableNow=True)
        .start()
    )
    if timeout_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout_s):
        q.stop()
