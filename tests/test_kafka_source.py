"""Kafka source (S3): value-JSON projection parity + graceful
degradation when the connector jar is absent (this sandbox)."""

import datetime
import json

from pyspark.sql import functions as F

from napalm_logs_spark.sources.kafka import (
    kafka_available,
    kafka_transcript_stream,
    parse_kafka_values,
)

BASE = datetime.datetime(2017, 7, 20, 21, 0, 0)


def test_parse_kafka_values_projection(spark):
    """The JSON projection (shared with the live source) maps raw
    key/value records to transcript rows; key overrides conv_id."""
    recs = [
        ("conv-k", json.dumps({"conv_id": "conv-j", "turn_idx": 0, "role": "agent",
                               "text": "hi", "tool": None, "ts": "2017-07-20T21:00:00"})),
        (None, json.dumps({"conv_id": "conv-j", "turn_idx": 1, "role": "tool",
                           "text": "out", "tool": "sh", "ts": "2017-07-20T21:00:05"})),
        (None, "not json at all"),          # undecodable → dropped (null conv_id)
    ]
    raw = spark.createDataFrame(recs, "key string, value string").select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
    )
    got = sorted(
        (r.conv_id, r.turn_idx, r.role, r.tool) for r in parse_kafka_values(raw).collect()
    )
    assert got == [("conv-j", 1, "tool", "sh"), ("conv-k", 0, "agent", None)]


def test_kafka_absent_raises_actionable_error(spark):
    assert not kafka_available(spark)  # sandbox has no connector jar
    try:
        kafka_transcript_stream(spark, "broker:9092", "transcripts")
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "--packages" in str(e)
