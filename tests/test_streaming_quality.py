"""The training-data quality operators are pure stateless projections,
so the SAME code must run unchanged inside Structured Streaming — a
100 TB backfill (batch) and a live firehose (stream) share one
implementation.  Streams here are parquet-dir readStream → operator →
memory/foreachBatch sink, compared row-for-row against the batch run."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from napalm_logs_spark.operators.text import gopher_rules, pii_scrub, quality_scores

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "the quick brown fox and that lazy dog have a rest in shade " * 8,
            "reach me at alice@example.com or 192.168.0.1 now",
            "aa bb",
            "the sea and the wind of a long day in the old port " * 6,
        ],
    }
)


@pytest.fixture()
def doc_stream(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(DOCS).coalesce(1).write.mode("append").parquet(src)
    batch_df = spark.read.parquet(src)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(src)
    return batch_df, stream_df


def _drain(spark, out_df, ckpt):
    rows = []
    q = (
        out_df.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda bdf, _bid: rows.extend(bdf.collect()))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate within 120s"
    return rows


@pytest.mark.parametrize(
    "op",
    [gopher_rules, pii_scrub, quality_scores],
    ids=["gopher_rules", "pii_scrub", "quality_scores"],
)
def test_quality_ops_identical_batch_vs_stream(spark, tmp_path, doc_stream, op):
    batch_df, stream_df = doc_stream
    out = op(stream_df)
    assert out.isStreaming
    got = {tuple(r) for r in _drain(spark, out, str(tmp_path / f"ck_{op.__name__}"))}
    want = {tuple(r) for r in op(batch_df).collect()}
    assert got == want and len(want) == len(DOCS)
