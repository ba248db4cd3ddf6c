"""Streaming CDC apply: per-batch latest-wins slices, merge-on-read.

The same "state IS the lakehouse table" recipe as
:mod:`streaming.sketch_stream`, applied to upsert/delete changelogs:
``operators.scd.cdc_reduce`` is ASSOCIATIVE (per key, "latest row by a
global total order" composes like MAX), so each micro-batch reduces to
its own per-key latest rows — delete rows kept as TOMBSTONES — written
as an idempotent ``_batch_id=<n>`` parquet slice (a replayed batch
overwrites its own slice and nothing else; exactly-once without a
state store).  The current snapshot is a merge-on-read over committed
slices: one window per key picks the globally-latest row, tombstones
suppress everything older, ``n_versions`` sums across slices.

At 10^12 rows this is the CDC shape that works: per-batch state is
bounded by the batch's DISTINCT KEYS (not its rows), nothing is ever
rewritten in place, slices compact under the engine's table
maintenance exactly like the sink/near-dup-index layouts, and the read
path is the same single-Exchange window as the batch
``cdc_apply`` — apply-over-log IS the read path.

``order_cols`` must totally order a key's rows across the WHOLE stream
(give (ts, seq)); ``_batch_id`` rides as a final deterministic
tie-break for pathological exact ties across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.scd import cdc_reduce


def cdc_batch_sink(
    slice_dir: str,
    key_cols: tuple,
    order_cols: tuple,
    op_col: str = "op",
):
    """foreachBatch function: reduce the micro-batch to its per-key
    latest rows (tombstones kept) and overwrite this batch's slice."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sl = cdc_reduce(batch_df, key_cols, order_cols, op_col)
        sl.write.mode("overwrite").parquet(f"{slice_dir}/_batch_id={batch_id}")

    return _write


def read_cdc_current(
    spark,
    slice_dir: str,
    key_cols: tuple,
    order_cols: tuple,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Merge-on-read current snapshot over all committed slices —
    equal, by associativity of :func:`cdc_reduce`, to ``cdc_apply``
    over the whole drained changelog (tested).  Keys whose latest row
    is a tombstone are absent; ``n_versions`` is the total changelog
    depth across slices (the compaction-pressure signal)."""
    df = spark.read.option("basePath", slice_dir).parquet(
        f"{slice_dir}/_batch_id=*"
    )
    order = [F.col(c).desc() for c in order_cols] + [F.col("_batch_id").desc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    wc = Window.partitionBy(*key_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_versions", F.sum("n_versions").over(wc).cast("long"))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn", "_batch_id")
    )


def run_cdc_stream_once(
    spark,
    source_dir: str,
    slice_dir: str,
    checkpoint_dir: str,
    schema,
    key_cols: tuple,
    order_cols: tuple,
    op_col: str = "op",
    *,
    timeout_s: float | None = 600,
) -> None:
    """Drain all available source files into per-batch CDC slices
    (availableNow trigger), exactly-once under replay."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(cdc_batch_sink(slice_dir, key_cols, order_cols, op_col))
        .trigger(availableNow=True)
        .start()
    )
    if timeout_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout_s):
        q.stop()
