"""Arbitrary stateful CEP on the ``transformWithStateInPandas`` API
(Spark 4 state-v2): typed state variables + event-time timers.

:func:`orphan_alert_stream` is the timer-native form of
``operators/cep.orphan_agent_turns`` (the request-that-never-got-its-
response alarm; the reference's alerta sink models only the positive
pairing, transport/alerta.py:46-69).  The stream-stream left-outer
interval join expresses the same thing, but buffers BOTH full streams
for horizon + watermark delay.  Here state per conversation is exactly
the *pending* agent turns plus a pruned list of recent tool timestamps,
and the alert fires from an event-time timer the moment the watermark
proves the horizon expired — the minimal state the semantics allow,
which at 10^12 turns is the difference between joining two buffered
streams and keeping a handful of open requests per conversation.

Arrow/pandas path throughout (no per-row Python between batches —
handleInputRows receives pandas frames); keyed by conv_id so the state
store shards with the stream's hash partitioning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


def tws_available() -> bool:
    """The transformWithStateInPandas state-server protocol speaks
    protobuf between the JVM and the Python driver worker; without the
    ``protobuf`` wheel the query crashes at init.  Probe it so callers
    degrade with a clear message instead (same pattern as the Kafka /
    Iceberg connector probes in ``jvm.py``)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

ORPHAN_OUT_SCHEMA = (
    "conv_id string, agent_turn int, agent_text string, agent_ts timestamp"
)

_PENDING_SCHEMA = "agent_turn int, agent_text string, agent_ts_us long"
_TOOLS_SCHEMA = "tool_ts_us long"


class _OrphanProcessor(StatefulProcessor):
    """Per-conv_id pending-request store with horizon timers.

    * agent turn  → append to ``pending``, register an event-time timer
      at its deadline (agent_ts + horizon);
    * tool turn   → clear every pending agent whose window
      [agent_ts, agent_ts + horizon] contains the tool's event time;
      remember the tool timestamp (bounded below by the watermark) so a
      tool that arrives *before* its out-of-order agent still clears it;
    * timer fires → every still-pending agent whose deadline ≤ expiry is
      an orphan: emit and drop.  The watermark guarantees no clearing
      tool turn can still arrive (a later tool would be watermark-late —
      the same boundary the stream-stream join form drops).
    """

    def __init__(self, horizon_seconds: int):
        self.h_us = int(horizon_seconds * 1_000_000)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.pending = handle.getListState("pending", _PENDING_SCHEMA)
        self.tools = handle.getListState("tools", _TOOLS_SCHEMA)
        self.handle = handle

    def _read(self, state):
        rows = list(state.get()) if state.exists() else []
        return rows

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        pending = self._read(self.pending)
        tool_ts = [r[0] for r in self._read(self.tools)]
        wm_us = max(timerValues.getCurrentWatermarkInMs(), 0) * 1000
        for pdf in rows:
            for r in pdf[pdf["role"] == "agent"].itertuples(index=False):
                ts_us = int(r.ts.value // 1000)  # pandas ns → µs
                pending.append((int(r.turn_idx), r.text, ts_us))
                self.handle.registerTimer((ts_us + self.h_us) // 1000 + 1)
            tool_ts.extend(
                int(t.value // 1000)
                for t in pdf.loc[pdf["role"] == "tool", "ts"]
            )
        # a tool clears every pending agent whose window contains it —
        # including a tool that arrived BEFORE its out-of-order agent
        # (re-filtering survivors from earlier batches is idempotent)
        pending = [
            p
            for p in pending
            if not any(p[2] <= t <= p[2] + self.h_us for t in tool_ts)
        ]
        self.pending.clear()
        if pending:
            self.pending.put(pending)
        # tool timestamps below the watermark can never clear a future
        # agent (late agents are dropped at the watermark) — prune
        keep_tools = [(t,) for t in tool_ts if t >= wm_us]
        self.tools.clear()
        if keep_tools:
            self.tools.put(keep_tools)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ):
        expiry_us = expiredTimerInfo.getExpiryTimeInMs() * 1000
        pending = self._read(self.pending)
        due = [p for p in pending if p[2] + self.h_us < expiry_us]
        left = [p for p in pending if p[2] + self.h_us >= expiry_us]
        self.pending.clear()
        if left:
            self.pending.put(left)
        if due:
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]] * len(due),
                    "agent_turn": [p[0] for p in due],
                    "agent_text": [p[1] for p in due],
                    "agent_ts": [pd.Timestamp(p[2] * 1000) for p in due],
                }
            )

    def close(self) -> None:
        pass


def orphan_alert_stream(
    transcripts: DataFrame,
    horizon_seconds: int = 60,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming orphan (request-timeout) alerts via
    ``transformWithStateInPandas`` — see module docstring.

    Output: (conv_id, agent_turn, agent_text, agent_ts), one row per
    agent turn whose conversation produced no tool turn within
    ``horizon_seconds`` — identical rows to the batch
    ``orphan_agent_turns`` for in-watermark data.

    Requires the ``protobuf`` wheel (the state-v2 JVM↔Python protocol);
    without it this raises immediately — use the stream-stream
    left-outer interval join form (``orphan_agent_turns(streaming=True)``)
    as the fallback with identical output.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the protobuf package; "
            "fall back to orphan_agent_turns(streaming=True) (same rows, "
            "join-buffered state instead of timer state)"
        )
    return (
        transcripts.select("conv_id", "turn_idx", "role", "text", "ts")
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .transformWithStateInPandas(
            statefulProcessor=_OrphanProcessor(horizon_seconds),
            outputStructType=ORPHAN_OUT_SCHEMA,
            outputMode="append",
            timeMode="EventTime",
        )
    )
