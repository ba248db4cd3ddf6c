"""Streaming Count-Min sketch: per-batch slices, merge-on-read.

The mergeability that defines the CM sketch (counter-wise sum) is what
makes it a streaming citizen: each micro-batch reduces to its own
≤ depth·width-row sketch, written as an idempotent ``_batch_id=<n>``
parquet slice (the engine's exactly-once sink recipe — a replayed
batch overwrites its own slice and nothing else), and the live sketch
is the counter-wise sum over committed slices.  No state store is
needed at all: the "state" is the lakehouse table itself, resumable
from checkpoint, compactable like any other slice table.

At 10^12 turns this is the frequency-tracking shape that works: the
per-batch shuffle is counter-sized (not key-sized), the merged sketch
never exceeds depth·width rows no matter the key cardinality, and a
point query never touches the raw stream.  Contrast with the
space-saving top-k in :mod:`streaming.stateful` (which keeps exact
heavy-hitter candidates): the sketch answers *any* key, space-saving
only the heavy ones — together they are the classic pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import count_min_sketch


def cms_batch_sink(
    sketch_dir: str,
    key_col: str = "key",
    *,
    depth: int = 4,
    width: int = 256,
):
    """foreachBatch function: reduce the micro-batch to its sketch and
    overwrite this batch's slice (idempotent under replay)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sk = count_min_sketch(batch_df, key_col, depth=depth, width=width)
        sk.write.mode("overwrite").parquet(
            f"{sketch_dir}/_batch_id={batch_id}"
        )

    return _write


def read_merged_sketch(spark, sketch_dir: str) -> DataFrame:
    """Counter-wise sum over all committed batch slices — by CMS
    mergeability this equals the sketch of the whole stream."""
    df = spark.read.option("basePath", sketch_dir).parquet(
        f"{sketch_dir}/_batch_id=*"
    )
    return df.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def run_cms_stream_once(
    spark,
    source_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    schema,
    key_col: str = "key",
    *,
    depth: int = 4,
    width: int = 256,
    timeout_s: float | None = 600,
) -> None:
    """Drain all available source files into per-batch sketch slices
    (availableNow trigger), exactly-once under replay."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            cms_batch_sink(sketch_dir, key_col, depth=depth, width=width)
        )
        .trigger(availableNow=True)
        .start()
    )
    if timeout_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout_s):
        q.stop()
