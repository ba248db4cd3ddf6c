"""Streaming sketches: per-batch slices, merge-on-read.

The mergeability that defines these sketches — counter-wise SUM for
Count-Min, register-wise MAX for HyperLogLog — is what makes them
streaming citizens: each micro-batch reduces to its own fixed-size
sketch, written as an idempotent ``batch_id=<n>`` parquet slice (the
engine's exactly-once sink recipe — a replayed batch overwrites its
own slice and nothing else), and the live sketch is the merge over
committed slices.  No state store is needed at all: the "state" is
the lakehouse table itself, resumable from checkpoint, compactable
like any other slice table.

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
            f"{sketch_dir}/batch_id={batch_id}"
        )

    return _write


def read_merged_sketch(spark, sketch_dir: str) -> DataFrame:
    """Counter-wise sum over all committed batch slices — by CMS
    mergeability this equals the sketch of the whole stream."""
    df = spark.read.option("basePath", sketch_dir).parquet(
        f"{sketch_dir}/batch_id=*"
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


# ---------------------------------------------------------------------------
# HyperLogLog on the stream — same slice recipe, MAX merge instead of SUM


def hll_batch_sink(sketch_dir: str, key_col: str = "key", *, p: int = 8):
    """foreachBatch function: reduce the micro-batch to its HLL register
    table and overwrite this batch's slice (idempotent under replay).

    Register max-merge is bit-identical to sketching the unioned input
    (operators.sketch.hll_registers), so the merged stream sketch IS
    the batch sketch of everything drained so far — exact replay, no
    state store, ≤ 2^p rows per slice whatever the key cardinality.
    """
    from ..operators.sketch import hll_registers

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, key_col, p=p)
        regs.write.mode("overwrite").parquet(
            f"{sketch_dir}/batch_id={batch_id}"
        )

    return _write


def read_merged_hll(spark, sketch_dir: str) -> DataFrame:
    """Register-wise MAX over all committed batch slices — by HLL
    mergeability this equals the register table of the whole stream."""
    df = spark.read.option("basePath", sketch_dir).parquet(
        f"{sketch_dir}/batch_id=*"
    )
    return df.groupBy("bucket").agg(F.max("max_rank").alias("max_rank"))


def run_hll_stream_once(
    spark,
    source_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    schema,
    key_col: str = "key",
    *,
    p: int = 8,
    timeout_s: float | None = 600,
) -> None:
    """Drain all available source files into per-batch HLL register
    slices (availableNow trigger), exactly-once under replay."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(hll_batch_sink(sketch_dir, key_col, p=p))
        .trigger(availableNow=True)
        .start()
    )
    if timeout_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout_s):
        q.stop()


# ---------------------------------------------------------------------------
# fixed-bin histogram on the stream — SUM merge, same slice recipe


def hist_batch_sink(
    sketch_dir: str, value_col: str = "value", *, bin_width: int = 1000
):
    """foreachBatch function: reduce the micro-batch to its fixed-bin
    histogram (operators.sketch.histogram_bins) and overwrite this
    batch's slice — idempotent under replay, bin-count-sized."""
    from ..operators.sketch import histogram_bins

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        hist = histogram_bins(batch_df, value_col, bin_width=bin_width)
        hist.write.mode("overwrite").parquet(
            f"{sketch_dir}/batch_id={batch_id}"
        )

    return _write


def read_merged_hist(spark, sketch_dir: str) -> DataFrame:
    """Bin-wise SUM over all committed batch slices — histogram
    mergeability makes this the histogram of the whole stream, so
    quantiles over it equal the batch answer on the full drained
    input (tested)."""
    df = spark.read.option("basePath", sketch_dir).parquet(
        f"{sketch_dir}/batch_id=*"
    )
    return df.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def run_hist_stream_once(
    spark,
    source_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    schema,
    value_col: str = "value",
    *,
    bin_width: int = 1000,
    timeout_s: float | None = 600,
) -> None:
    """Drain all available source files into per-batch histogram
    slices (availableNow trigger), exactly-once under replay."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            hist_batch_sink(sketch_dir, value_col, bin_width=bin_width)
        )
        .trigger(availableNow=True)
        .start()
    )
    if timeout_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout_s):
        q.stop()


# ---------------------------------------------------------------------------
# drift monitor on the stream — contingency cells are SUM-mergeable


def drift_cells_batch_sink(
    cells_dir: str, bucket_col: str, split_col: str
):
    """foreachBatch function: reduce the micro-batch to its
    (bucket, split, o) contingency cells and overwrite this batch's
    slice — idempotent under replay, cell-table-sized."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        cells = batch_df.groupBy(
            F.col(bucket_col).alias("bucket"),
            F.col(split_col).alias("split"),
        ).agg(F.count(F.lit(1)).alias("o"))
        cells.write.mode("overwrite").parquet(
            f"{cells_dir}/_batch_id={batch_id}"
        )

    return _write


def read_merged_drift(spark, cells_dir: str) -> DataFrame:
    """Cell-wise SUM over committed slices, fed to
    operators.text.chi2_from_cells — equals the batch chi2_drift over
    the whole drained stream (tested).  The live drift dashboard reads
    this; the raw stream is never re-scanned."""
    from ..operators.text import chi2_from_cells

    df = spark.read.option("basePath", cells_dir).parquet(
        f"{cells_dir}/_batch_id=*"
    )
    cells = df.groupBy("bucket", "split").agg(F.sum("o").alias("o"))
    return chi2_from_cells(cells)


def run_drift_stream_once(
    spark,
    source_dir: str,
    cells_dir: str,
    checkpoint_dir: str,
    schema,
    bucket_col: str,
    split_col: str,
    *,
    timeout_s: float | None = 600,
) -> None:
    """Drain all available source files into per-batch cell slices
    (availableNow trigger), exactly-once under replay."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(drift_cells_batch_sink(cells_dir, bucket_col, split_col))
        .trigger(availableNow=True)
        .start()
    )
    if timeout_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout_s):
        q.stop()
