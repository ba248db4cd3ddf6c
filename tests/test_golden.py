"""The golden corpus: every reference fixture case must normalize to the
exact expected envelope (timestamp popped, per the reference's own
harness rule — tests/test_config.py:195-209), and the corpus must be
bidirectionally complete (every case produced an envelope; every
envelope maps to a case)."""

import json

import pandas as pd
import pytest

from napalm_logs_spark.operators.normalize import normalize_pandas
from napalm_logs_spark.profiles import load_registry
from napalm_logs_spark.sources.transcripts import (
    golden_cases,
    golden_transcripts_pandas,
)


@pytest.fixture(scope="module")
def registry():
    return load_registry()


@pytest.fixture(scope="module")
def golden_out(registry):
    pdf = golden_transcripts_pandas()
    out = normalize_pandas(pdf, registry, include_raw=False, include_unknown=True)
    return pdf, out


def row_to_envelope(row) -> dict:
    """Envelope row → reference-shaped dict for golden comparison."""
    got = {
        "error": row["error"],
        "host": row["host"],
        "ip": row["ip"],
        "yang_model": row["yang_model"],
        "os": row["os"],
    }
    if row["yang_message"] is not None:
        got["yang_message"] = json.loads(row["yang_message"])
    if row["message_details"] is not None:
        got["message_details"] = json.loads(row["message_details"])
    if pd.notna(row["facility"]):
        got["facility"] = int(row["facility"])
    if pd.notna(row["severity"]):
        got["severity"] = int(row["severity"])
    if pd.notna(row["state"]):
        got["state"] = int(row["state"])
    if row["state_tag"] is not None:
        got["state_tag"] = row["state_tag"]
    return got


def test_golden_corpus_complete_and_exact(golden_out):
    pdf, out = golden_out
    cases = {f"{c['os']}#{c['error']}#{c['case']}": c for c in golden_cases()}
    assert len(cases) >= 133

    # completeness: one envelope per case, no extras
    assert set(out["conv_id"]) == set(cases), (
        "cases without envelope or envelopes without case"
    )
    failures = []
    for conv_id, grp in out.groupby("conv_id"):
        if len(grp) != 1:
            failures.append((conv_id, f"{len(grp)} envelopes"))
            continue
        expected = dict(cases[conv_id]["expected"])
        assert expected.pop("timestamp", False), f"{conv_id}: fixture lacks timestamp"
        row = grp.iloc[0]
        assert pd.notna(row["timestamp"]), f"{conv_id}: no timestamp produced"
        got = row_to_envelope(row)
        if got != expected:
            failures.append((conv_id, {"expected": expected, "got": got}))
    assert not failures, json.dumps(failures[:3], indent=2, default=str)


def test_golden_timestamps_event_time(golden_out):
    """With the fixture-era default year, parseable syslog dates resolve
    to exact epochs (e.g. junos INTERFACE_DOWN → 2017-07-20T21:45:59Z)."""
    _, out = golden_out
    row = out[out["conv_id"] == "junos#INTERFACE_DOWN#default"].iloc[0]
    assert int(row["timestamp"]) == 1500587159


def test_two_runs_byte_identical(registry):
    pdf = golden_transcripts_pandas()
    a = normalize_pandas(pdf, registry)
    b = normalize_pandas(pdf, registry)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_unknown_fallback(registry):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"],
            "turn_idx": [0],
            "role": ["agent"],
            "text": ["totally not a syslog line"],
            "tool": [None],
            "ts": [pd.Timestamp("2017-07-20 21:45:59")],
        }
    )
    out = normalize_pandas(pdf, registry)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["os"] == "unknown"
    assert row["error"] == "UNKNOWN"
    assert json.loads(row["message_details"]) == {"message": "totally not a syslog line"}
    # determinism deviation: fallback is event time, not now()
    assert int(row["timestamp"]) == 1500587159


def test_raw_fallback(registry):
    # valid junos prefix, tag that matches no message profile
    text = "<28>Jul 20 21:45:59 vmx01 mib2d[2424]: NO_SUCH_TAG_EVER: some body"
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"],
            "turn_idx": [0],
            "role": ["agent"],
            "text": [text],
            "tool": [None],
            "ts": [pd.Timestamp("2017-07-20 21:45:59")],
        }
    )
    out = normalize_pandas(pdf, registry)
    raw = out[out["error"] == "RAW"]
    assert len(raw) >= 1
    row = raw.iloc[0]
    assert row["yang_model"] == "raw"
    assert row["yang_message"] is None
    details = json.loads(row["message_details"])
    assert details["host"] == "vmx01"
    assert details["facility"] == 3 and details["severity"] == 4


def test_every_profile_has_a_fixture_and_vice_versa(registry):
    """Bidirectional completeness, reference test_config.py:85-131: every
    message profile has >= 1 golden case, and every golden case dir maps
    to a profile error of its OS."""
    import os as _os

    from napalm_logs_spark.sources.transcripts import DEFAULT_GOLDEN_DIR

    problems = []
    for os_name, osp in registry.oses.items():
        os_dir = _os.path.join(DEFAULT_GOLDEN_DIR, os_name)
        dirs = set(_os.listdir(os_dir)) if _os.path.isdir(os_dir) else set()
        errors = {mp.error for mp in osp.messages}
        for missing in sorted(errors - dirs):
            problems.append(f"{os_name}/{missing}: profile without fixture")
        for extra in sorted(dirs - errors):
            problems.append(f"{os_name}/{extra}: fixture without profile")
    assert not problems, problems
