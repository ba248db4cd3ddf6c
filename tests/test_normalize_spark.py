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
