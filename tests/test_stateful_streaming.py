"""applyInPandasWithState operators: exact TTL dedup and the entity
state machine — including state carried across micro-batches and across
checkpoint restarts."""

import datetime

import pytest
from pyspark.sql import functions as F

from napalm_logs_spark.streaming.stateful import (
    entity_state_stream,
    exact_ttl_dedup_stream,
)

BASE = datetime.datetime(2017, 7, 20, 21, 0, 0)
SCHEMA = "os string, host string, message string, turn_idx int, ts timestamp"


def _rows(offsets, msg="m1"):
    return [
        ("junos", "r1", msg, i, BASE + datetime.timedelta(seconds=o))
        for i, o in enumerate(offsets)
    ]


def _run_dedup(spark, src, ckpt, name):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    deduped = exact_ttl_dedup_stream(stream, ttl_seconds=5.0)
    q = (
        deduped.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}")


def test_exact_ttl_anchored_streaming(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(_rows([0, 3, 6]), SCHEMA).coalesce(1).write.parquet(src)
    got = _run_dedup(spark, src, ckpt, "ttl_stream_1")
    # anchored: 0 kept, 3 dropped (within 5s of anchor 0), 6 kept
    assert sorted(r.turn_idx for r in got.collect()) == [0, 2]


def test_state_survives_checkpoint_restart(spark, tmp_path):
    # memory sink can't recover from checkpoints → use a file sink
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            exact_ttl_dedup_stream(stream, ttl_seconds=5.0)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(_rows([0]), SCHEMA).coalesce(1).write.mode("append").parquet(src)
    run()
    assert spark.read.parquet(out).count() == 1

    # second run, same checkpoint: a duplicate at +3s must be suppressed
    # by state REMEMBERED from the previous run
    spark.createDataFrame(
        [("junos", "r1", "m1", 9, BASE + datetime.timedelta(seconds=3))], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    got = spark.read.parquet(out)
    assert got.count() == 1, [r.asDict() for r in got.collect()]


def test_entity_state_machine_stream(spark, tmp_path):
    src, ckpt = str(tmp_path / "esrc"), str(tmp_path / "eckpt")
    rows = [
        ("r1", "interface", "xe-0", BASE, 0, "INTERFACE_DOWN", 0),
        ("r1", "interface", "xe-0", BASE + datetime.timedelta(seconds=10), 1, "INTERFACE_UP", 1),
        ("r1", "interface", "xe-0", BASE + datetime.timedelta(seconds=20), 1, "INTERFACE_UP", 2),  # no change
        ("r1", "interface", "xe-1", BASE + datetime.timedelta(seconds=5), 1, "INTERFACE_UP", 3),
    ]
    schema = "host string, family string, entity string, ts timestamp, state01 int, error string, turn_idx int"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = entity_state_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("fsm_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.sql("select * from fsm_stream").collect()
    xe0 = sorted(
        ((r.ts, r.status, r.prev_state) for r in got if r.entity == "xe-0"),
    )
    assert [(s, p) for _, s, p in xe0] == [("open", None), ("closed", 0)]
    xe1 = [r for r in got if r.entity == "xe-1"]
    assert len(xe1) == 1 and xe1[0].status == "closed"
