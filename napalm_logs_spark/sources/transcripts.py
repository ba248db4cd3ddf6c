"""Transcript sources: golden fixture corpus + deterministic synthesis.

The engine's input shape (BASELINE input_hint) is a table of multi-turn
transcripts::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Two generators produce that shape:

* :func:`golden_transcripts_pandas` — re-expresses the reference's
  golden corpus (``tests/config/<os>/<ERROR>/<case>/syslog.msg`` +
  ``yang.json``, 133 cases) as transcript rows.  The syslog line rides
  in ``text``; the expected envelope is returned alongside for the
  correctness harness.
* :func:`synth_transcripts_pandas` — seeded synthetic corpus for CEP
  scenarios and benches: replicates golden lines across ``n_convs``
  conversations with deterministic timestamps, optional hot-key skew,
  duplicate bursts (dedup scenarios) and agent/tool turn interleaving.

Everything is a pure function of its arguments — two runs are
byte-identical (no wall-clock, no unseeded RNG).
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta, timezone

import pandas as pd

try:
    from pyspark.sql import types as T

    TRANSCRIPT_SCHEMA = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
except ImportError:  # pragma: no cover
    TRANSCRIPT_SCHEMA = None

#: golden corpus: the vendored snapshot of the reference's Apache-2.0
#: test fixtures (133 syslog.msg + yang.json cases) — repo-local so the
#: engine and its tests run standalone.  NLS_GOLDEN_DIR overrides;
#: the reference checkout is a final fallback for odd layouts.
_REPO_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "golden",
)
DEFAULT_GOLDEN_DIR = (
    _REPO_GOLDEN_DIR if os.path.isdir(_REPO_GOLDEN_DIR) else "/root/reference/tests/config"
)

#: fixture-era base timestamp (naive UTC; Spark session runs in UTC)
BASE_TS = datetime(2017, 7, 20, 21, 45, 59)


def golden_cases(root: str | None = None):
    """Yield dicts {os, error, case, text, expected} for every fixture."""
    root = root or os.environ.get("NLS_GOLDEN_DIR", DEFAULT_GOLDEN_DIR)
    for os_name in sorted(os.listdir(root)):
        os_dir = os.path.join(root, os_name)
        if not os.path.isdir(os_dir):
            continue
        for error_name in sorted(os.listdir(os_dir)):
            err_dir = os.path.join(os_dir, error_name)
            if not os.path.isdir(err_dir):
                continue
            for case_name in sorted(os.listdir(err_dir)):
                case_dir = os.path.join(err_dir, case_name)
                msg_path = os.path.join(case_dir, "syslog.msg")
                yang_path = os.path.join(case_dir, "yang.json")
                if not os.path.isfile(msg_path):
                    continue
                with open(msg_path) as fh:
                    text = fh.read().strip()
                expected = None
                if os.path.isfile(yang_path):
                    with open(yang_path) as fh:
                        expected = json.load(fh)
                yield {
                    "os": os_name,
                    "error": error_name,
                    "case": case_name,
                    "text": text,
                    "expected": expected,
                }


def golden_transcripts_pandas(root: str | None = None) -> pd.DataFrame:
    """The golden corpus as transcript rows (one conv per case)."""
    rows = []
    for i, case in enumerate(golden_cases(root)):
        rows.append(
            {
                "conv_id": f"{case['os']}#{case['error']}#{case['case']}",
                "turn_idx": 0,
                "role": "agent",
                "text": case["text"],
                "tool": None,
                "ts": BASE_TS + timedelta(seconds=i),
            }
        )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


# ---------------------------------------------------------------------------
# synthetic corpus


def _golden_texts(root: str | None = None):
    return [c["text"] for c in golden_cases(root)]


def synth_transcripts_pandas(
    n_convs: int = 100,
    turns_per_conv: int = 20,
    *,
    seed: int = 42,
    hot_conv_fraction: float = 0.0,
    dup_fraction: float = 0.0,
    tool_fraction: float = 0.2,
    step_seconds: float = 1.0,
    root: str | None = None,
) -> pd.DataFrame:
    """Deterministic synthetic transcripts built from golden text lines.

    ``hot_conv_fraction`` routes that share of all rows into a single
    hot conversation (skew scenario); ``dup_fraction`` repeats the
    previous turn's text verbatim (dedup scenario); ``tool_fraction``
    marks turns as ``role='tool'`` with a tool name (join scenario).
    """
    rng = random.Random(seed)
    texts = _golden_texts(root)
    tools = ["search", "calc", "deploy", "query", "probe"]
    rows = []
    total = n_convs * turns_per_conv
    hot_rows = int(total * hot_conv_fraction)
    assignments = ["conv-hot"] * hot_rows + [
        f"conv-{i % n_convs:05d}" for i in range(total - hot_rows)
    ]
    rng.shuffle(assignments)
    turn_counters: dict = {}
    prev_text: dict = {}
    for i, conv in enumerate(assignments):
        turn = turn_counters.get(conv, 0)
        turn_counters[conv] = turn + 1
        if conv in prev_text and rng.random() < dup_fraction:
            text = prev_text[conv]
        else:
            text = texts[rng.randrange(len(texts))]
        prev_text[conv] = text
        is_tool = rng.random() < tool_fraction
        rows.append(
            {
                "conv_id": conv,
                "turn_idx": turn,
                "role": "tool" if is_tool else rng.choice(["agent", "user"]),
                "text": text,
                "tool": rng.choice(tools) if is_tool else None,
                "ts": BASE_TS + timedelta(seconds=i * step_seconds),
            }
        )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def transcripts_df(spark, pdf: pd.DataFrame):
    """pandas transcripts → Spark DataFrame with the canonical schema."""
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
