"""SFT training-sample construction from transcripts.

The last mile of a transcript training-data pipeline: render each
conversation (``conv_id, turn_idx, role, text, tool, ts`` — BASELINE
input_hint) into one training sample with a deterministic chat
template, and emit the per-turn character spans + loss mask a trainer
needs (loss on agent turns only — the standard SFT masking rule).
The reference has no training notion; this is the transcript-payload
analog of its final serialize-and-publish stage
(`/root/reference/napalm_logs/device.py:336-351` assembles the fixed
output envelope per message — here the envelope is a training sample
per conversation).

Template (fixed, versioned by TEMPLATE_VERSION):

    <|role|>\\n{text}\\n        per turn, concatenated in turn order

Span offsets index into the rendered sample string (0-based,
half-open, character units) and cover the {text} body only — the
template frame is never loss-masked.

Scale notes (100 TB / 10^12 turns):

* :func:`sft_spans` is one window over ``conv_id`` — the SAME key and
  exchange as :func:`convstats.transcripts_from_events`, so when
  composed the whole render plan has a single shuffle.  All
  expressions are JVM built-ins (no Python).
* :func:`sft_render` adds one ordered ``collect_list`` rollup per
  conversation; per-group state is bounded by conversation length
  (same bound as convstats' fingerprint), with the same ``max_turns``
  truncation guard for adversarial conversations.
* Packing rendered samples to a fixed token budget is NOT re-done
  here: samples are documents, so :func:`text.pack_spfhp` /
  :func:`text.pack_chunks` compose directly (see
  tests/test_sft.py::test_compose_with_spfhp_packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TEMPLATE_VERSION = 1

#: roles whose text spans receive loss (mask = 1)
LOSS_ROLES = ("agent",)


def _header(role: Column) -> Column:
    return F.concat(F.lit("<|"), role, F.lit("|>\n"))


def _ws_tokens(text: Column) -> Column:
    """Whitespace token count; 0 for empty/all-space text (split of ''
    returns [''] — guard it explicitly, mirrored in the SQL oracle)."""
    t = F.trim(text)
    return (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("int")
    )


def sft_spans(tdf: DataFrame) -> DataFrame:
    """Per-turn loss-mask spans within the rendered sample.

    One row per turn: the half-open character span ``[span_start,
    span_end)`` of the turn's text body inside the conversation's
    rendered sample, ``mask`` (1 = trainable, agent turns), and the
    turn's whitespace token count.  One window on ``conv_id`` — the
    running sum of rendered-turn lengths gives each turn's offset.
    """
    hdr = _header(F.col("role"))
    rendered_len = F.length(hdr) + F.length("text") + F.lit(1)  # +\n
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    turn_off = F.coalesce(F.sum(rendered_len).over(w), F.lit(0))
    span_start = (turn_off + F.length(hdr)).cast("long")
    return tdf.select(
        "conv_id",
        "turn_idx",
        "role",
        span_start.alias("span_start"),
        (span_start + F.length("text")).alias("span_end"),
        F.col("role").isin(*LOSS_ROLES).cast("int").alias("mask"),
        _ws_tokens(F.col("text")).alias("n_tokens"),
    )


def sft_render(tdf: DataFrame, *, max_turns: int = 100_000) -> DataFrame:
    """One training sample per conversation.

    ``sample_text`` is the template-rendered conversation;
    ``n_tokens`` / ``n_loss_tokens`` are whitespace token totals
    (all turns / loss-masked turns) — the numbers a data-mixture
    planner budgets with.  ``sort_array(collect_list(struct(...)))``
    keeps render order deterministic under any shuffle arrival;
    ``max_turns`` truncates pathological conversations (deterministic,
    documented — same guard as convstats.conversation_fingerprints).
    """
    rendered = F.concat(_header(F.col("role")), F.col("text"), F.lit("\n"))
    mask = F.col("role").isin(*LOSS_ROLES)
    turns = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("turn_idx"),
                rendered.alias("rt"),
                _ws_tokens(F.col("text")).alias("tok"),
                mask.cast("int").alias("m"),
            )
        )
    )
    kept = F.slice(turns, 1, max_turns)
    return tdf.groupBy("conv_id").agg(
        F.concat_ws(
            "", F.transform(kept, lambda s: s["rt"])
        ).alias("sample_text"),
        F.aggregate(
            kept, F.lit(0), lambda acc, s: acc + s["tok"]
        ).alias("n_tokens"),
        F.aggregate(
            kept, F.lit(0), lambda acc, s: acc + s["tok"] * s["m"]
        ).alias("n_loss_tokens"),
        F.count(F.lit(1)).alias("n_turns"),
    )
