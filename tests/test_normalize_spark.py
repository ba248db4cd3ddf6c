"""End-to-end Spark test of the vectorized normalize stage: golden
corpus as a Spark DataFrame → mapInPandas → envelopes, matching the
pure-pandas path exactly (engine/test symmetry)."""

import json

import pandas as pd

from napalm_logs_spark.operators.normalize import normalize, normalize_pandas
from napalm_logs_spark.profiles import load_registry
from napalm_logs_spark.sources.transcripts import (
    golden_transcripts_pandas,
    transcripts_df,
)


def test_spark_normalize_matches_pandas(spark):
    registry = load_registry()
    pdf = golden_transcripts_pandas()
    sdf = transcripts_df(spark, pdf).repartition(8)
    got = (
        normalize(sdf, registry)
        .orderBy("conv_id", "turn_idx", "os")
        .toPandas()
    )
    exp = (
        normalize_pandas(pdf, registry)
        .sort_values(["conv_id", "turn_idx", "os"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for col in ("conv_id", "os", "error", "host", "yang_model",
                "yang_message", "message_details", "tag", "message"):
        assert list(got[col].fillna("∅")) == list(exp[col].fillna("∅")), col
    assert [int(x) for x in got["timestamp"]] == [int(x) for x in exp["timestamp"]]


def test_spark_normalize_plan_is_single_stage(spark):
    """The whole normalize is one mapInPandas over the scan — no shuffle."""
    registry = load_registry()
    sdf = transcripts_df(spark, golden_transcripts_pandas())
    plan = normalize(sdf, registry)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_every_corpus_time_format_resolves():
    """M4 closure (r4 verdict item 6): the vendored profile corpus can
    only produce the time_format directives written in its YAML — grep
    them ALL and prove _resolve_epoch handles each (profile-declared
    strptime path).  dateparser's fuzzy reach (relative dates, free
    text) stays deliberately out of scope: no profile can emit it."""
    import calendar
    import glob
    import os
    import re
    from datetime import datetime

    from napalm_logs_spark.operators.normalize import _resolve_epoch
    from napalm_logs_spark.profiles import registry as regmod

    root = os.path.join(os.path.dirname(regmod.__file__), "vendored")
    fmts = set()
    for path in glob.glob(os.path.join(root, "**", "*.yml"), recursive=True):
        for m in re.finditer(r"time_format:\s*[\"']([^\"']+)[\"']",
                             open(path).read()):
            fmts.add(m.group(1))
    # the corpus today: BSD syslog + 3 year-full variants; if a new
    # vendored profile adds a format, this test makes M4 prove it
    assert len(fmts) >= 4, fmts
    ref = datetime(2017, 7, 1, 12, 34, 56, 789000)
    for fmt in sorted(fmts):
        s = ref.strftime(fmt)
        epoch = _resolve_epoch(s, "", fmt, 2017)
        assert epoch is not None, f"unresolvable corpus format: {fmt}"
        want = ref if "%f" in fmt else ref.replace(microsecond=0)
        assert epoch == calendar.timegm(want.timetuple()), fmt
