"""CLI entry point + built-in demo profiles (standalone operation)."""

import datetime
import json

import pandas as pd
import pytest

from napalm_logs_spark.profiles.registry import BUILTIN_PROFILE_DIR, load_registry
from napalm_logs_spark.operators.normalize import normalize_pandas


def test_builtin_profiles_standalone():
    reg = load_registry(BUILTIN_PROFILE_DIR)
    assert "demo" in reg.os_names()
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"],
            "turn_idx": [0],
            "role": ["agent"],
            "text": ["<30>Jul 20 21:45:59 sw1 LINKD: link eth0/1 changed state to down"],
            "tool": [None],
            "ts": [pd.Timestamp("2017-07-20 21:45:59")],
        }
    )
    out = normalize_pandas(pdf, reg, include_raw=False, include_unknown=False)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["os"] == "demo" and row["error"] == "LINK_STATE"
    assert json.loads(row["yang_message"]) == {
        "interfaces": {"interface": {"eth0/1": {"state": {"oper_status": "DOWN"}}}}
    }
    assert row["entity"] == "eth0/1"


def test_cli_normalize_and_run(spark, tmp_path):
    # reuse the test session's JVM: getOrCreate inside main() attaches
    from napalm_logs_spark.__main__ import main
    from napalm_logs_spark.sources.transcripts import (
        golden_transcripts_pandas,
        transcripts_df,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "m.jsonl")
    transcripts_df(spark, golden_transcripts_pandas().iloc[:30]).coalesce(1).write.parquet(src)

    assert main(["normalize", "--source", src, "--output", out]) == 0
    assert spark.read.parquet(out).count() >= 30

    assert main([
        "run", "--source", src, "--sink", sink, "--checkpoint", ckpt,
        "--metrics", metrics, "--no-dedup",
    ]) == 0
    from napalm_logs_spark.streaming.sink import read_sink

    assert read_sink(spark, sink).count() >= 30
    assert json.loads(open(metrics).readline())["num_input_rows"] == 30
