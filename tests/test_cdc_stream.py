"""Streaming CDC apply (streaming/cdc_stream.py): merge-on-read over
per-batch slices equals batch cdc_apply over the whole changelog
(associativity end-to-end), tombstones work across batches, replay is
idempotent."""

import datetime

import pytest

from napalm_logs_spark.operators.scd import cdc_apply
from napalm_logs_spark.streaming.cdc_stream import (
    cdc_batch_sink,
    read_cdc_current,
    run_cdc_stream_once,
)

SCHEMA = "key string, op string, value int, ts timestamp, seq long"
BASE = datetime.datetime(2024, 1, 1)
KEYS, ORDER = ("key",), ("ts", "seq")


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "sl", "ckpt")}


def _rows(spec):
    # spec: (key, op, value, seconds, seq)
    return [(k, o, v, BASE + datetime.timedelta(seconds=s), q)
            for k, o, v, s, q in spec]


def _write(spark, src, spec):
    spark.createDataFrame(_rows(spec), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _drain(spark, dirs):
    run_cdc_stream_once(
        spark, dirs["src"], dirs["sl"], dirs["ckpt"], SCHEMA, KEYS, ORDER
    )


def test_merge_on_read_equals_batch_apply(spark, dirs):
    b1 = [
        ("a", "U", 1, 0, 0), ("a", "U", 2, 5, 1),
        ("b", "U", 7, 1, 2),
        ("c", "U", 4, 2, 3),
        ("d", "D", 0, 3, 4),          # deleted before ever upserted
    ]
    b2 = [
        ("a", "U", 3, 9, 5),          # a advances across the batch line
        ("b", "D", 0, 8, 6),          # b tombstoned in a LATER batch
        ("d", "U", 9, 7, 7),          # d re-inserted in a later batch
        ("e", "U", 5, 6, 8),
    ]
    _write(spark, dirs["src"], b1)
    _drain(spark, dirs)
    _write(spark, dirs["src"], b2)
    _drain(spark, dirs)

    got = read_cdc_current(spark, dirs["sl"], KEYS, ORDER)
    whole = cdc_apply(
        spark.createDataFrame(_rows(b1 + b2), SCHEMA), KEYS, ORDER
    )
    key = lambda r: (r.key, r.op, r.value, r.ts, r.seq, r.n_versions)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, whole.collect()))
    snap = {r.key: r for r in got.collect()}
    assert set(snap) == {"a", "c", "d", "e"}
    assert snap["a"].value == 3 and snap["a"].n_versions == 3
    assert snap["d"].value == 9 and snap["d"].n_versions == 2


def test_replay_overwrites_own_slice_only(spark, dirs):
    b1 = [("a", "U", 1, 0, 0), ("b", "U", 2, 1, 1)]
    b2 = [("a", "U", 5, 2, 2)]
    _write(spark, dirs["src"], b1)
    _drain(spark, dirs)
    _write(spark, dirs["src"], b2)
    _drain(spark, dirs)
    before = sorted(
        (r.key, r.value, r.n_versions)
        for r in read_cdc_current(spark, dirs["sl"], KEYS, ORDER).collect()
    )
    # simulate a replayed batch 1: the sink must overwrite slice 1 and
    # leave the snapshot unchanged
    sink = cdc_batch_sink(dirs["sl"], KEYS, ORDER)
    sink(spark.createDataFrame(_rows(b2), SCHEMA), 1)
    after = sorted(
        (r.key, r.value, r.n_versions)
        for r in read_cdc_current(spark, dirs["sl"], KEYS, ORDER).collect()
    )
    assert before == after


def test_slice_is_key_sized_not_row_sized(spark, dirs):
    # 1000 changelog rows over 7 keys: the slice holds 7 rows
    spec = [(f"k{i % 7}", "U", i, i, i) for i in range(1000)]
    _write(spark, dirs["src"], spec)
    _drain(spark, dirs)
    sl = spark.read.parquet(f"{dirs['sl']}/_batch_id=0")
    assert sl.count() == 7
    assert sl.agg({"n_versions": "sum"}).collect()[0][0] == 1000
