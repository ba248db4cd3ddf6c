"""Prometheus metrics derived from envelopes — the reference's largest
transport (`/root/reference/napalm_logs/transport/prometheus.py`, ~620
lines of per-error Counter/Gauge registrations) re-expressed as three
DataFrame operators plus a text-exposition renderer.

Semantics mirrored from the reference:

* one Counter per error code, ``napalm_logs_<error_lower>``, labelled
  by host (+ the notification's entity when the profile extracted one
  — the reference names that label per family: interface/user/peer/
  neighbor; this engine carries it uniformly as ``entity``,
  prometheus.py:70-93 etc.);
* ``napalm_logs_interface_state{host, interface}`` = 1 UP / 0 DOWN
  (prometheus.py:82-93);
* a generic per-family state Gauge for any enveloped ``state``:
  metric = ``state_tag`` if the profile set one else
  ``<error-family>_state`` lowercased (prometheus.py:43-52), value =
  the LAST observed state per (metric, host, entity) under the
  envelope's event order.

Scale shape: both aggregations are plain partial-aggregated groupBys
whose OUTPUT cardinality is the metric-label space (hosts × entities ×
error codes) — bounded and tiny next to the event stream, which is the
only reason a driver-side exposition render (`write_textfile`) is
legitimate at 100 TB: the collect is over the label space, never the
events.  The renderer itself is pure column expressions, so the
exposition lines can also stay distributed (e.g. as a sink table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PREFIX = "napalm_logs_"  # reference transport/prometheus.py:37 et al.


def _metric_name(error_col, state_tag_col):
    """Gauge metric name per reference prometheus.py:43-46: state_tag
    when the profile set one, else the error family + ``_state``
    (``INTERFACE_DOWN`` → ``interface_state``)."""
    family = F.regexp_replace(error_col, r"_[^_]+$", "")
    return F.coalesce(
        state_tag_col, F.lower(F.concat(family, F.lit("_state")))
    )


def error_counters(env: DataFrame) -> DataFrame:
    """Per-error Counters: (metric, host, entity, value) — the
    ``napalm_logs_<error>`` family.  One partial-aggregated shuffle."""
    return (
        env.filter(F.col("error").isNotNull() & F.col("host").isNotNull())
        .groupBy(
            F.concat(F.lit(PREFIX), F.lower(F.col("error"))).alias("metric"),
            F.col("host"),
            F.col("entity"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
    )


def state_gauges(env: DataFrame) -> DataFrame:
    """Per-(metric, host, entity) LAST-state Gauges (reference sets the
    gauge on every message; last write wins).  Event order = (ts,
    turn_idx) — the engine's stable envelope order.

    ``interface_state`` is special-cased exactly like the reference
    (prometheus.py:93): derived from the INTERFACE_UP/INTERFACE_DOWN
    error itself (1/0), independent of whether the profile put a
    ``state`` value in the envelope."""
    iface = env.filter(
        F.col("error").isin("INTERFACE_UP", "INTERFACE_DOWN")
        & F.col("host").isNotNull()
    ).select(
        "ts", "turn_idx", "host", "entity",
        F.lit(PREFIX + "interface_state").alias("metric"),
        F.when(F.col("error") == "INTERFACE_UP", F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("state"),
    )
    generic = env.filter(
        F.col("state").isNotNull()
        & F.col("host").isNotNull()
        & ~F.col("error").isin("INTERFACE_UP", "INTERFACE_DOWN")
    ).select(
        "ts", "turn_idx", "host", "entity",
        F.concat(
            F.lit(PREFIX), _metric_name(F.col("error"), F.col("state_tag"))
        ).alias("metric"),
        F.col("state"),
    )
    st = iface.unionByName(generic)
    w = Window.partitionBy("metric", "host", "entity").orderBy(
        F.col("ts").desc(), F.col("turn_idx").desc()
    )
    return (
        st.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "metric", "host", "entity", F.col("state").cast("double").alias("value")
        )
    )


def render_lines(metrics: DataFrame, kind: str) -> DataFrame:
    """(metric, host, entity, value) → Prometheus text-exposition lines
    (one column ``line``), pure column expressions.  ``kind`` is
    ``counter`` or ``gauge`` (stamped so the TYPE headers can be
    grouped by the caller).  Label values are escaped per the
    exposition spec (backslash, quote, newline)."""

    def esc(c):
        x = F.regexp_replace(c, r"\\", r"\\\\")
        x = F.regexp_replace(x, '"', '\\\\"')
        return F.regexp_replace(x, "\n", "\\\\n")

    labels = F.concat_ws(
        ",",
        F.concat(F.lit('host="'), esc(F.col("host")), F.lit('"')),
        F.when(
            F.col("entity").isNotNull(),
            F.concat(F.lit('entity="'), esc(F.col("entity")), F.lit('"')),
        ),
    )
    # integral values render as plain integers (Java's %s on a big
    # double would switch to E-notation); non-integral keep %s
    val = F.when(
        F.col("value") == F.floor(F.col("value")),
        F.col("value").cast("long").cast("string"),
    ).otherwise(F.format_string("%s", F.col("value")))
    return metrics.select(
        F.col("metric"),
        F.lit(kind).alias("kind"),
        F.format_string(
            "%s{%s} %s", F.col("metric"), labels, val
        ).alias("line"),
    )


def exposition(env: DataFrame) -> DataFrame:
    """Full exposition body as ordered (metric, kind, line) rows:
    counters + gauges, deterministically sorted (metric, then line) —
    the distributed form of what the reference's HTTP endpoint serves."""
    return (
        render_lines(error_counters(env), "counter")
        .unionByName(render_lines(state_gauges(env), "gauge"))
        .orderBy("metric", "line")
    )


def write_textfile(env: DataFrame, path: str) -> int:
    """Render the exposition to ``path`` (node-exporter textfile
    collector pattern) with # TYPE headers.  The collect is over the
    label space (see module docstring), not the event stream.  Returns
    the number of sample lines written."""
    rows = exposition(env).collect()
    out, seen = [], set()
    for r in rows:
        if r.metric not in seen:
            seen.add(r.metric)
            out.append(f"# TYPE {r.metric} {r.kind}")
        out.append(r.line)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(out) + "\n")
    import os

    os.replace(tmp, path)
    return len(rows)
