"""Kafka publisher sink (SURVEY §2.6 K2) with graceful degradation.

The reference's Kafka transport (`/root/reference/napalm_logs/transport/
kafka.py:26-58`) opens a ``KafkaProducer`` and sends each serialized
envelope to a topic (default ``napalm-logs``).  The Spark re-expression
is declarative: serialize the envelope to canonical JSON (the K6
serializer), key by ``conv_id`` so per-conversation ordering rides the
Kafka partition (the same per-device in-order contract as the
reference's per-OS socket, `device.py:265-276`), and hand the stream to
``writeStream.format("kafka")`` — delivery tracking, batching and
retries collapse into the Kafka sink's own exactly-once-per-epoch
semantics with checkpointed offsets.

No broker or connector jar ships in this sandbox, so the builders probe
the classpath exactly like the source (:mod:`..sources.kafka`) and fail
with an actionable message; the serialization path itself
(:func:`envelope_to_kafka_records`) is pure DataFrame code and fully
tested offline (round-trips through the source's JSON parser).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.kafka import kafka_available

DEFAULT_TOPIC = "napalm-logs"  # reference transport/kafka.py:43

#: canonical envelope payload fields, in the reference's envelope order
#: (device.py:336-351); struct field order is fixed so the JSON bytes
#: are deterministic
_PAYLOAD_COLS = (
    "error", "host", "ip", "timestamp", "yang_message", "message_details",
    "yang_model", "os", "facility", "severity", "state", "state_tag",
    "conv_id", "turn_idx",
)


def envelope_to_kafka_records(
    env: DataFrame, topic: str = DEFAULT_TOPIC, serializer: str = "json"
) -> DataFrame:
    """Envelope rows → Kafka record shape ``(key, value, topic)``.

    ``value`` is the serialized envelope — ``json`` (default here;
    pure-JVM ``to_json``) or any name from the K6 serializer matrix
    (``msgpack`` is the reference's wire default,
    serializer/__init__.py:24-45 — binary value, Arrow-batched python
    pack).  ``key`` is ``conv_id`` so one conversation always lands in
    one Kafka partition (per-key ordering).  Usable on batch and
    streaming frames alike, and unit-testable without a broker.
    """
    from ..operators.serialize import serialize_envelopes

    # explicit nulls for the json path: the reference envelope always
    # carries every key (device.py:336-351) — consumers schema-validate
    # on the fixed shape, so dropped-null variable-shape records would
    # break them.  serialize_envelopes owns the shared
    # to_json → pandas-UDF bridge (one place for the type mapping).
    cols = tuple(c for c in _PAYLOAD_COLS if c in env.columns)
    out = serialize_envelopes(env, serializer, payload_cols=cols, out_col="value")
    return out.select(
        F.col("conv_id").cast("string").alias("key"),
        "value",
        F.lit(topic).alias("topic"),
    )


def kafka_envelope_sink(
    env: DataFrame,
    bootstrap_servers: str,
    checkpoint: str,
    *,
    topic: str = DEFAULT_TOPIC,
    trigger_available_now: bool = False,
    query_name: str = "nls-kafka-sink",
):
    """Start the streaming Kafka publisher; returns the StreamingQuery.

    Raises a clear error when the connector jar is absent (launch with
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
    """
    spark = env.sparkSession
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka data source not on the classpath; launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "(no broker/package in this sandbox — use the parquet/Iceberg "
            "sink instead)"
        )
    writer = (
        envelope_to_kafka_records(env, topic)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
