"""Unit semantics for the SFT sample builder (operators/sft.py):
span offsets actually index the rendered sample, masks follow the
agent-only loss rule, and rendered samples compose with the SPFHP
packer as ordinary documents."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from napalm_logs_spark.operators.sft import sft_render, sft_spans
from napalm_logs_spark.operators.text import pack_histogram

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        ("c1", 0, "user",  "hello there",      None,  T0),
        ("c1", 1, "agent", "hi how can I help", None,  T0),
        ("c1", 2, "tool",  "search results",   "web", T0),
        ("c1", 3, "agent", "here you go",      None,  T0),
        ("c2", 0, "user",  "   ",              None,  T0),  # whitespace-only
        ("c2", 1, "agent", "",                 None,  T0),  # empty
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )


def test_spans_index_rendered_text(tdf):
    """The invariant the trainer relies on: slicing the rendered sample
    at [span_start, span_end) recovers exactly the turn's text."""
    samples = {r["conv_id"]: r["sample_text"] for r in sft_render(tdf).collect()}
    turns = {(r["conv_id"], r["turn_idx"]): r["text"] for r in tdf.collect()}
    spans = sft_spans(tdf).collect()
    assert len(spans) == 6
    for r in spans:
        s = samples[r["conv_id"]]
        assert s[r["span_start"]:r["span_end"]] == turns[(r["conv_id"], r["turn_idx"])]


def test_masks_and_tokens(tdf):
    got = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in sft_spans(tdf).collect()}
    assert [got[("c1", i)]["mask"] for i in range(4)] == [0, 1, 0, 1]
    assert got[("c1", 1)]["n_tokens"] == 5
    # empty / whitespace-only turns count zero tokens
    assert got[("c2", 0)]["n_tokens"] == 0
    assert got[("c2", 1)]["n_tokens"] == 0


def test_render_totals(tdf):
    got = {r["conv_id"]: r.asDict() for r in sft_render(tdf).collect()}
    c1 = got["c1"]
    assert c1["n_turns"] == 4
    assert c1["n_tokens"] == 2 + 5 + 2 + 3
    assert c1["n_loss_tokens"] == 5 + 3
    assert c1["sample_text"].startswith("<|user|>\nhello there\n<|agent|>\n")
    assert got["c2"]["n_tokens"] == 0 and got["c2"]["n_loss_tokens"] == 0


def test_render_max_turns_truncation(tdf):
    got = {r["conv_id"]: r.asDict()
           for r in sft_render(tdf, max_turns=2).collect()}
    c1 = got["c1"]
    # only turns 0-1 feed the sample; n_turns still reports the true count
    assert c1["sample_text"] == "<|user|>\nhello there\n<|agent|>\nhi how can I help\n"
    assert c1["n_tokens"] == 7 and c1["n_loss_tokens"] == 5
    assert c1["n_turns"] == 4


def test_compose_with_spfhp_packing(tdf):
    """Rendered samples are documents: the SPFHP packer consumes them
    directly (conv_id as doc id, whitespace tokens as length)."""
    samples = sft_render(tdf).select(
        F.col("conv_id").alias("doc_id"), F.col("sample_text").alias("text")
    )
    packs = pack_histogram(samples, budget=32)
    rows = packs.collect()
    packed_ids = {r["doc_id"] for r in rows}
    # c1 has 12 tokens of text + 8 template tokens -> packs; c2 renders
    # to template-only tokens and packs too (non-empty rendered text)
    assert "c1" in packed_ids
    for r in rows:
        assert r["pack_id"] is not None
