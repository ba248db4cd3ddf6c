"""Streaming GRPO/RLOO baselines (streaming/advantage_stream.py):
merged per-batch stat slices equal the whole-stream statistics, the
join path reproduces the batch operator bit-for-bit even when a
rollout group SPANS micro-batches, and replay is idempotent."""

import pytest

from napalm_logs_spark.operators.ranking import group_advantages
from napalm_logs_spark.streaming.advantage_stream import (
    adv_batch_sink,
    advantages_from_stats,
    group_stats,
    read_merged_stats,
    run_adv_stream_once,
)

SCHEMA = "prompt_id long, rollout_id long, reward long"


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "st", "ckpt")}


def _rows(lo, hi):
    # groups of 8 by construction, but batch boundaries will SPLIT them
    return [(i // 8, i, (i * 37) % 23 - 11) for i in range(lo, hi)]


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def test_merged_stats_equal_whole_stream(spark, dirs):
    # 0..100 then 100..200: groups 12 and 24 straddle the batch cut
    _write(spark, dirs["src"], _rows(0, 100))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    _write(spark, dirs["src"], _rows(100, 200))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    merged = read_merged_stats(spark, dirs["st"])
    whole = group_stats(spark.createDataFrame(_rows(0, 200), SCHEMA))
    key = lambda r: (r["prompt_id"], r["n"], r["sum_r"], r["sum_r2"])
    assert sorted(map(key, merged.collect())) == sorted(map(key, whole.collect()))


def test_stream_advantages_bit_equal_batch(spark, dirs):
    _write(spark, dirs["src"], _rows(0, 100))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    _write(spark, dirs["src"], _rows(100, 200))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    rollouts = spark.createDataFrame(_rows(0, 200), SCHEMA)
    via_stream = advantages_from_stats(
        rollouts, read_merged_stats(spark, dirs["st"])
    )
    via_batch = group_advantages(rollouts)
    a = sorted(map(tuple, via_stream.collect()))
    b = sorted(map(tuple, via_batch.collect()))
    assert a == b  # incl. the float grpo/rloo columns: bit-identical


def test_replayed_batch_overwrites_its_slice(spark, dirs):
    _write(spark, dirs["src"], _rows(0, 64))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    # replay batch 0 out-of-band (crash-after-write, pre-commit replay)
    batch = spark.read.parquet(dirs["src"])
    adv_batch_sink(dirs["st"])(batch, 0)
    merged = read_merged_stats(spark, dirs["st"])
    whole = group_stats(spark.createDataFrame(_rows(0, 64), SCHEMA))
    key = lambda r: (r["prompt_id"], r["n"], r["sum_r"], r["sum_r2"])
    assert sorted(map(key, merged.collect())) == sorted(map(key, whole.collect()))


def test_slices_are_group_sized(spark, dirs):
    # 512 rollouts -> 64 groups: each slice holds group rows, not rollouts
    _write(spark, dirs["src"], _rows(0, 512))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    import glob
    import os

    slices = glob.glob(os.path.join(dirs["st"], "batch_id=*"))
    assert slices
    for s in slices:
        assert spark.read.parquet(s).count() <= 64


def test_slices_visible_to_plain_partition_discovery(spark, dirs):
    """ADVICE r3: the slice layout must not hide behind _-prefixed dirs
    — a plain spark.read.parquet(stats_dir) (no glob, no basePath) has
    to discover every slice, so external compaction tooling works."""
    _write(spark, dirs["src"], _rows(0, 100))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    _write(spark, dirs["src"], _rows(100, 200))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    plain = spark.read.parquet(dirs["st"])
    assert "batch_id" in plain.columns  # discovered as a partition col
    assert plain.count() > 0
    # and it carries the same groups the explicit-glob reader merges
    assert (plain.select("prompt_id").distinct().count()
            == read_merged_stats(spark, dirs["st"]).count())


def test_unmerged_group_surfaces_with_null_advantages(spark, dirs):
    """ADVICE r3: rollouts whose group has no committed stats yet must
    surface (NULL advantages), not silently drop."""
    _write(spark, dirs["src"], _rows(0, 64))
    run_adv_stream_once(spark, dirs["src"], dirs["st"], dirs["ckpt"], SCHEMA)
    # rollouts include group 100, which has no slice yet
    rollouts = spark.createDataFrame(
        _rows(0, 64) + [(100, 9001, 5)], SCHEMA
    )
    out = advantages_from_stats(rollouts, read_merged_stats(spark, dirs["st"]))
    assert out.count() == 65
    orphan = out.filter("prompt_id = 100").collect()
    assert len(orphan) == 1
    assert orphan[0]["n"] is None and orphan[0]["grpo_adv"] is None
