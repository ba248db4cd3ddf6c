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

    n1 = read_sink(spark, sink).count()
    assert n1 >= 30
    assert json.loads(open(metrics).readline())["num_input_rows"] == 30

    # a second batch lands, then the maintenance job compacts batch 0
    transcripts_df(spark, golden_transcripts_pandas().iloc[30:40]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert main([
        "run", "--source", src, "--sink", sink, "--checkpoint", ckpt,
        "--metrics", metrics, "--no-dedup",
    ]) == 0
    n2 = read_sink(spark, sink).count()
    assert n2 > n1
    import os

    assert main(["compact", "--table", sink]) == 0
    assert read_sink(spark, sink).count() == n2
    assert not os.path.isdir(sink + "/_batch_id=0")
    assert os.path.isdir(sink + "/_compacted_upto=0")


def test_cli_orphan_alerts(spark, tmp_path):
    import datetime

    from napalm_logs_spark.__main__ import main

    BASE = datetime.datetime(2017, 7, 20, 21, 0, 0)
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    rows = [
        ("c1", 0, "agent", "ask a", None, BASE),
        ("c1", 1, "tool", "t", "search", BASE + datetime.timedelta(seconds=5)),
        ("c2", 0, "agent", "ask b", None, BASE),
    ]
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    orph = str(tmp_path / "orphans")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    cli = [
        "run", "--source", src, "--sink", sink, "--checkpoint", ckpt,
        "--no-dedup", "--orphan-sink", orph, "--orphan-horizon", "10",
        "--watermark", "0 seconds",
    ]
    assert main(cli) == 0

    # a far-future agent+tool pair advances BOTH sides' watermarks past
    # c2's horizon (itself answered in time, so not an orphan); the
    # second run resumes the alert query from its own checkpoint
    sentinel = [
        ("c9", 0, "agent", "s", None, BASE + datetime.timedelta(seconds=2000)),
        ("c9", 1, "tool", "t", "search", BASE + datetime.timedelta(seconds=2001)),
    ]
    spark.createDataFrame(sentinel, schema).coalesce(1).write.mode("append").parquet(src)
    assert main(cli) == 0
    got = spark.read.parquet(orph).collect()
    assert [(r.conv_id, r.agent_turn) for r in got] == [("c2", 0)]


def test_cli_neardup(spark, tmp_path):
    import numpy as np

    from napalm_logs_spark.__main__ import main

    rng = np.random.RandomState(5)
    base = rng.randn(6, 8)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((50, [float(x) for x in base[3] + 1e-4 * rng.randn(8)]))
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
        1
    ).write.parquet(src)
    out, idx, ckpt = (str(tmp_path / d) for d in ("out", "idx", "ckpt"))
    assert main([
        "neardup", "--source", src, "--out", out, "--index", idx,
        "--checkpoint", ckpt,
    ]) == 0
    from napalm_logs_spark.streaming.neardup_stream import read_kept

    kept = {r.vec_id for r in read_kept(spark, out).collect()}
    assert kept == {0, 1, 2, 3, 4, 5}, kept  # 50 dropped (near-copy of 3)
    # the index is a compactable lakehouse table
    assert main(["compact", "--table", idx, "--upto", "0"]) == 0


def test_cli_docfilter(spark, tmp_path):
    from napalm_logs_spark.__main__ import main

    good = (
        "the cat and the dog have a long conversation about the weather "
        "that goes on with many plain words in it " * 3
    )
    rows = [
        (1, good + " mail me at a.b@example.com or 10.1.2.3"),
        (2, "x y z"),  # fails gopher min_words
        (3, good),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(src)
    assert main([
        "docfilter", "--source", src, "--output", out,
        "--gopher", "--pii-scrub", "--langid",
    ]) == 0
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 3}, "doc 2 must fail the Gopher gates"
    assert "<EMAIL>" in got[1].text and "<IP>" in got[1].text
    assert "example.com" not in got[1].text
    assert got[1].n_email == 1 and got[1].n_ipv4 == 1
    assert got[3].lang_pred == "en"


def test_cli_dedup(spark, tmp_path):
    from napalm_logs_spark.__main__ import main

    body = "the quick brown fox jumps over the lazy dog again and again "
    rows = [
        (1, body * 4),
        (2, body * 4),                     # exact dup of 1
        (3, body * 4 + "with a tiny tail"),  # near-dup of 1 (high jaccard)
        (4, "a completely different document about spark shuffles"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(src)

    out1 = str(tmp_path / "exact")
    assert main(["dedup", "--source", src, "--output", out1]) == 0
    assert {r.doc_id for r in spark.read.parquet(out1).collect()} == {1, 3, 4}

    out2 = str(tmp_path / "mh")
    assert main([
        "dedup", "--source", src, "--output", out2,
        "--method", "minhash", "--threshold", "0.7",
    ]) == 0
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == {1, 4}


def test_cli_config_file_multi_sink_fanout(spark, tmp_path, monkeypatch):
    """A deployment-style YAML config (reference scripts/cli.py:272-282)
    drives the whole run: source/checkpoint from the file, a multi-sink
    fan-out with per-sink filters the flags can't express, ${ENV}
    interpolation, and CLI-flag precedence over file values."""
    from napalm_logs_spark.__main__ import main
    from napalm_logs_spark.sources.transcripts import (
        golden_transcripts_pandas,
        transcripts_df,
    )
    from napalm_logs_spark.streaming.sink import read_sink

    src = str(tmp_path / "src")
    all_sink = str(tmp_path / "all")
    filt_sink = str(tmp_path / "filtered")
    ckpt = str(tmp_path / "ckpt")
    transcripts_df(spark, golden_transcripts_pandas().iloc[:30]).coalesce(
        1
    ).write.parquet(src)

    monkeypatch.setenv("NLS_TEST_SRC", src)
    cfg = tmp_path / "deploy.yaml"
    cfg.write_text(f"""
source: ${{NLS_TEST_SRC}}
checkpoint: {ckpt}
no_dedup: true
watermark: 10 seconds
sinks:
  - path: {all_sink}
    send_raw: true
    send_unknown: true
  - path: {filt_sink}
    whitelist: [INTERFACE_DOWN]
""")
    assert main(["--config-file", str(cfg), "run"]) == 0
    n_all = read_sink(spark, all_sink).count()
    filtered = read_sink(spark, filt_sink)
    n_filt = filtered.count()
    assert n_all > n_filt > 0
    errs = {r.error for r in filtered.select("error").distinct().collect()}
    assert errs == {"INTERFACE_DOWN"}

    # flag precedence: an explicit --sink ADDS to the config fan-out,
    # an explicit --checkpoint OVERRIDES the file's value
    extra = str(tmp_path / "extra")
    ckpt2 = str(tmp_path / "ckpt2")
    assert main([
        "--config-file", str(cfg), "run",
        "--sink", extra, "--checkpoint", ckpt2,
    ]) == 0
    assert read_sink(spark, extra).count() == n_all


def test_cli_config_file_errors(tmp_path):
    from napalm_logs_spark.config import build_sinks, load_config

    bad = tmp_path / "bad.yaml"
    bad.write_text("source: ${NLS_UNSET_VAR_XYZ}\n")
    import pytest as _pytest

    with _pytest.raises(KeyError, match="NLS_UNSET_VAR_XYZ"):
        load_config(str(bad))
    with _pytest.raises(ValueError, match="bad sink entry"):
        build_sinks([{"path": "/x", "whitelst": ["typo"]}])


def test_cli_run_requires_source_from_somewhere(capsys):
    from napalm_logs_spark.__main__ import main
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["run", "--sink", "/tmp/x"])


def test_config_scalar_sink_becomes_list():
    import argparse

    from napalm_logs_spark.config import merge_config

    args = argparse.Namespace(sink=None, source=None)
    merge_config(args, {"sink": "/data/out", "source": "/data/in"}, [])
    assert args.sink == ["/data/out"]  # not iterated char-by-char later
    # explicit flag wins over the file
    args2 = argparse.Namespace(sink=["/flag"], source=None)
    merge_config(args2, {"sink": "/file"}, ["--sink", "/flag"])
    assert args2.sink == ["/flag"]


def test_config_scalar_whitelist_and_abbreviated_flags():
    import argparse

    import pytest as _pytest

    from napalm_logs_spark.config import _flag_given, build_sinks

    # a natural single-value YAML scalar becomes a one-element tuple
    [spec] = build_sinks([{"path": "/x", "whitelist": "INTERFACE_DOWN"}])
    assert spec.whitelist == ("INTERFACE_DOWN",)
    with _pytest.raises(ValueError, match="string or a"):
        build_sinks([{"path": "/x", "blacklist": None}])
    # argparse prefix abbreviations count as explicitly given — the
    # file must NOT override `--check /my/ckpt`
    assert _flag_given(["--check", "/my/ckpt"], "checkpoint")
    assert _flag_given(["--checkpoint=/c"], "checkpoint")
    assert not _flag_given(["--source", "/s"], "checkpoint")
