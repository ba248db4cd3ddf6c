"""Iceberg table adapter with graceful degradation.

The engine's canonical lakehouse format is Apache Iceberg (the north
rule's table layer).  This sandbox ships no ``iceberg-spark-runtime``
jar and has no network, so the adapter probes for Iceberg support at
runtime and degrades to the partitioned-parquet layout that
``sink.exactly_once_parquet_sink`` implements — identical exactly-once
semantics (idempotent per-batch-id replace ≙ Iceberg MERGE/overwrite on
the batch-id partition), identical lineage columns.

On a real cluster, enable with:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog class is loadable in this JVM
    (probed through Spark's classloader, so ``--packages``-provided
    runtime jars are detected — see :mod:`..jvm`)."""
    from ..jvm import jvm_class_available

    return jvm_class_available(spark, "org.apache.iceberg.spark.SparkCatalog")


def write_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_or_path: str,
    order_cols=("conv_id", "turn_idx"),
) -> str:
    """Idempotently land one micro-batch.

    Iceberg present  → ``overwritePartitions`` on the ``_batch_id``
    identity partition of ``table_or_path`` (a catalog table name).
    Iceberg absent   → overwrite the ``_batch_id=<n>`` parquet directory
    (same replace-don't-append semantics).

    Returns which mode was used ('iceberg' | 'parquet').
    """
    spark = batch_df.sparkSession
    enriched = (
        batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
        .withColumn("_task_partition", F.spark_partition_id())
        .sortWithinPartitions(*order_cols)
    )
    if iceberg_available(spark) and "/" not in table_or_path:
        (
            enriched.writeTo(table_or_path)
            .option("check-ordering", "false")
            .overwritePartitions()
        )
        return "iceberg"
    import os

    target = os.path.join(table_or_path, f"_batch_id={int(batch_id)}")
    enriched.write.mode("overwrite").parquet(target)
    return "parquet"


def iceberg_transcript_stream(
    spark: SparkSession,
    table: str,
    max_files_per_micro_batch: int | None = None,
    stream_from_timestamp_ms: int | None = None,
) -> DataFrame:
    """Streaming read of the transcripts Iceberg table (the north-rule
    source): incremental snapshot tailing with optional per-micro-batch
    admission bound (the backpressure knob on this source — Iceberg's
    ``streaming-max-files-per-micro-batch``) and optional start point
    (``stream-from-timestamp``).

    Degrades exactly like the Kafka source when the runtime jar is
    absent: raises with the spark-submit recipe instead of failing
    deep inside query planning.  For jar-less environments the parquet
    directory source in :mod:`.pipeline` is the drop-in stand-in
    (identical downstream pipeline).
    """
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; launch with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
            "and a configured SparkCatalog, or point the pipeline at a "
            "parquet directory source instead"
        )
    reader = spark.readStream.format("iceberg")
    if max_files_per_micro_batch:
        reader = reader.option(
            "streaming-max-files-per-micro-batch", str(max_files_per_micro_batch)
        )
    if stream_from_timestamp_ms is not None:
        reader = reader.option(
            "stream-from-timestamp", str(stream_from_timestamp_ms)
        )
    return reader.load(table)
