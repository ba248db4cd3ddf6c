"""Observability (metrics table) + Iceberg adapter degradation."""

import json
import os

from napalm_logs_spark.sources.transcripts import (
    golden_transcripts_pandas,
    transcripts_df,
)
from napalm_logs_spark.streaming.iceberg import iceberg_available, write_batch
from napalm_logs_spark.streaming.pipeline import run_stream_once


def test_metrics_jsonl_per_batch(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    mpath = str(tmp_path / "metrics.jsonl")
    pdf = golden_transcripts_pandas().iloc[:40]
    transcripts_df(spark, pdf).coalesce(1).write.parquet(src)
    run_stream_once(spark, src, [out], ckpt, dedup=False, metrics_jsonl=mpath)
    rows = [json.loads(l) for l in open(mpath)]
    assert rows, "no metrics captured"
    row = rows[0]
    assert row["num_input_rows"] == 40
    assert row["observed"]["n_rows"] >= 40  # explode can exceed input
    assert "n_raw" in row["observed"] and "n_unknown" in row["observed"]
    assert row["batch_id"] == 0


def test_iceberg_degrades_to_parquet(spark, tmp_path):
    # no iceberg runtime in this sandbox: adapter must report and use parquet
    assert iceberg_available(spark) is False
    pdf = golden_transcripts_pandas().iloc[:10]
    df = transcripts_df(spark, pdf)
    mode = write_batch(df, 7, str(tmp_path / "lake"))
    assert mode == "parquet"
    back = spark.read.option("basePath", str(tmp_path / "lake")).parquet(
        str(tmp_path / "lake") + "/_batch_id=*"
    )
    assert back.count() == 10
    assert set(["_batch_id", "_task_partition"]).issubset(back.columns)
    # replay the same batch id: replace, not append
    write_batch(df, 7, str(tmp_path / "lake"))
    assert spark.read.option("basePath", str(tmp_path / "lake")).parquet(
        str(tmp_path / "lake") + "/_batch_id=*"
    ).count() == 10


def test_iceberg_source_degrades_without_jar(spark):
    import pytest

    from napalm_logs_spark.streaming.iceberg import (
        iceberg_available,
        iceberg_transcript_stream,
    )

    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="--packages"):
        iceberg_transcript_stream(spark, "lake.transcripts")


def test_pipeline_routes_iceberg_source(spark):
    import pytest

    from napalm_logs_spark.streaming.pipeline import build_stream

    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        build_stream(spark, "iceberg:lake.transcripts")
