"""Kafka transcript source (SURVEY §2.1 S3) with graceful degradation.

The reference's Kafka listener (`/root/reference/napalm_logs/listener/
kafka.py:28-88`) consumes a consumer-group topic, JSON-decodes each
record, and feeds the ``message`` field into the pipeline.  The Spark
re-expression is declarative: ``readStream.format("kafka")`` plus a
JSON projection into the transcript schema — the consumer group,
offset tracking, and rebalancing all collapse into Spark's Kafka source
with checkpointed offsets (exactly-once, which the reference's
auto-commit consumer cannot guarantee).

This sandbox has no broker and no ``spark-sql-kafka`` package, so
:func:`kafka_available` probes for the data-source class and
:func:`kafka_transcript_stream` raises a clear, actionable error when
it is absent.  On a real cluster:

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver> ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .transcripts import TRANSCRIPT_SCHEMA


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka data-source provider is loadable in this JVM
    (probed through Spark's classloader — see :mod:`..jvm`)."""
    from ..jvm import jvm_class_available

    return jvm_class_available(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    )


def kafka_transcript_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of transcript rows from a Kafka topic whose
    record values are JSON objects with the transcript fields.

    ``max_offsets_per_trigger`` is the backpressure bound — the analog
    of the reference's ZMQ HWM (`config/__init__.py:31`).
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka data source not on the classpath; launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "(no broker/package in this sandbox — use the parquet/Iceberg "
            "transcript source instead)"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    return parse_kafka_values(raw)


def parse_kafka_values(raw: DataFrame) -> DataFrame:
    """JSON record value → transcript columns (shared by the live source
    and tests, which feed the same shape from a non-Kafka stream).

    The Kafka partition key carries ``conv_id`` by convention (ordering
    per conversation = per-key ordering within a Kafka partition, the
    same per-device ordering contract as the reference's per-OS socket);
    a key-less record falls back to the JSON field.
    """
    parsed = raw.select(
        F.col("key").cast("string").alias("_key"),
        F.from_json(F.col("value").cast("string"), TRANSCRIPT_SCHEMA).alias("_r"),
    )
    return parsed.select(
        F.coalesce(F.col("_key"), F.col("_r.conv_id")).alias("conv_id"),
        F.col("_r.turn_idx").alias("turn_idx"),
        F.col("_r.role").alias("role"),
        F.col("_r.text").alias("text"),
        F.col("_r.tool").alias("tool"),
        F.col("_r.ts").alias("ts"),
    ).filter(F.col("conv_id").isNotNull())
