"""The vectorized normalize stage — the engine's hot path.

One Arrow-batched ``mapInPandas`` stage implements the whole per-message
pipeline of the reference (which spreads it over three OS processes):

  OS/prefix identification  (reference server.py:194-216  — P2)
  facility/severity math    (server.py:187-191            — P4)
  tag-gated message match   (device.py:132-190            — M2)
  value casts               (device.py:169-177            — M3)
  timestamp resolution      (device.py:217-224,283-291    — M4)
  YANG-path emit            (device.py:192-208            — M5)
  python-profile escape     (base.py:349-446              — M6)
  RAW / UNKNOWN fallbacks   (device.py:296-317, server.py:347-363 — M7/M8)
  state flag attach         (device.py:348-351            — M9)

Scale design: the profile registry is closure-captured (broadcast-sized,
a few hundred KB) and its regexes compile lazily *once per executor*
(``lru_cache``).  Matching is vectorized: per (os, prefix) a single
``Series.str.extract`` over the not-yet-matched rows, then message
profiles are gated by a hash groupby on ``tag`` before any message regex
runs — the same cheap-predicate-first trick the reference applies
row-at-a-time, here applied per Arrow batch.  Python-dict work (YANG
emit, canonical JSON) only touches rows that matched a profile.

A message may match multiple OS profiles → the stage *explodes* (the
reference flatMaps to every matching OS, server.py:194-216); rows no OS
matched become UNKNOWN envelopes; rows whose OS matched but no message
profile matched become RAW envelopes.

Determinism deviation (documented): where the reference stamps
``now()`` for unparseable timestamps, this engine falls back to the
row's event time ``ts`` so two runs over the same table are
byte-identical.  Year-less syslog dates get a configurable
``default_year`` (2017, the golden-fixture era) instead of
dateparser's "current year".
"""

from __future__ import annotations

import calendar
import json
from datetime import datetime
from functools import lru_cache
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from ..profiles.registry import (
    OsProfile,
    ProfileRegistry,
    load_registry,
    python_emit,
    python_extract,
)

try:  # allow pure-pandas use (unit tests) without a JVM
    from pyspark.sql import types as T

    ENVELOPE_SCHEMA = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("os", T.StringType()),
            T.StructField("error", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("ip", T.StringType()),
            T.StructField("timestamp", T.LongType()),
            T.StructField("facility", T.IntegerType()),
            T.StructField("severity", T.IntegerType()),
            T.StructField("yang_model", T.StringType()),
            T.StructField("yang_message", T.StringType()),
            T.StructField("message_details", T.StringType()),
            T.StructField("state", T.LongType()),
            T.StructField("state_tag", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("message", T.StringType()),
            T.StructField("entity", T.StringType()),
        ]
    )
except ImportError:  # pragma: no cover
    ENVELOPE_SCHEMA = None

_OUT_COLS = [
    "conv_id", "turn_idx", "role", "tool", "ts",
    "os", "error", "host", "ip", "timestamp", "facility", "severity",
    "yang_model", "yang_message", "message_details", "state", "state_tag",
    "tag", "message", "entity",
]

DEFAULT_IP = "127.0.0.1"


def canonical_json(obj) -> str:
    """Deterministic JSON encoding shared by the engine and the tests."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


# ---------------------------------------------------------------------------
# timestamp resolution (M4)


@lru_cache(maxsize=65536)
def _resolve_epoch(date: str, time: str, fmt: str, default_year: int):
    try:
        parsed = datetime.strptime(f"{date} {time}", fmt)
    except (ValueError, TypeError):
        return None
    if parsed.year == 1900:  # format without %Y
        parsed = parsed.replace(year=default_year)
    return calendar.timegm(parsed.timetuple())


# ---------------------------------------------------------------------------
# stage A: prefix identification (P2/P4), vectorized per (os, prefix)


def _prefix_stage(texts: pd.Series, osp: OsProfile, default_year: int) -> pd.DataFrame | None:
    """First matching prefix wins per OS; returns the partially-parsed
    frame (index ⊆ texts.index) or None when nothing matched."""
    remaining = texts
    frames = []
    for prefix_id, pp in enumerate(osp.prefixes):
        if remaining.empty:
            break
        if pp.python_path is not None:
            extracted = remaining.map(lambda s, p=pp.python_path: python_extract(p, s))
            hit = extracted.notna()
            if not hit.any():
                continue
            # build per-row from each dict — key sets may differ between
            # rows (multiple alternations inside one extract()) and must
            # not bleed into each other
            dicts = list(extracted[hit])
            hit_index = extracted.index[hit]
            rows = pd.DataFrame(
                {
                    "_details": [
                        {k: v for k, v in d.items() if k != "timestamp"}
                        for d in dicts
                    ],
                    "host": [d.get("host") for d in dicts],
                    "tag": [d.get("tag") for d in dicts],
                    "message": [
                        d["message"].strip() if isinstance(d.get("message"), str) else d.get("message")
                        for d in dicts
                    ],
                    "facility": [
                        int(d["pri"]) // 8 if d.get("pri") is not None else None
                        for d in dicts
                    ],
                    "severity": [
                        int(d["pri"]) % 8 if d.get("pri") is not None else None
                        for d in dicts
                    ],
                    "_epoch": [d.get("timestamp") for d in dicts],
                },
                index=hit_index,
            )
            for det, msg in zip(rows["_details"], rows["message"]):
                if msg is not None:
                    det["message"] = msg
            frames.append(rows)
            remaining = remaining[~hit]
            continue
        cp = pp.pattern
        try:
            raw = remaining.str.extract(cp.pattern, expand=True)
        except ValueError:
            continue
        colmap = {idx - 1: name for name, idx in cp.group_index.items()}
        raw = raw.rename(columns=colmap)
        hit = raw["pri"].notna()
        if not hit.any():
            continue
        rows = raw[hit].where(raw[hit].notna(), None)
        if "message" in rows.columns:
            rows["message"] = rows["message"].map(
                lambda m: m.strip() if isinstance(m, str) else m
            )
        # the partially-parsed dict (message_details), key set per prefix
        detail_cols = [c for c in rows.columns if c != "timestamp"]
        details = rows[detail_cols].to_dict("records")
        rows["_details"] = details
        if "pri" in rows.columns:
            pri = rows["pri"].map(lambda p: int(p) if p is not None else None)
            rows["facility"] = pri.map(lambda p: p // 8 if p is not None else None)
            rows["severity"] = pri.map(lambda p: p % 8 if p is not None else None)
        else:
            rows["facility"] = None
            rows["severity"] = None
        for col in ("host", "tag", "message"):
            if col not in rows.columns:
                rows[col] = None
        if "timestamp" in rows.columns:  # python prefixes resolve time themselves
            rows["_epoch"] = rows["timestamp"]
        elif pp.time_format and "date" in rows.columns and "time" in rows.columns:
            fmt = pp.time_format
            rows["_epoch"] = [
                _resolve_epoch(d, t, fmt, default_year) if d and t else None
                for d, t in zip(rows["date"], rows["time"])
            ]
        else:
            rows["_epoch"] = None
        frames.append(
            rows[["_details", "host", "tag", "message", "facility", "severity", "_epoch"]]
        )
        remaining = remaining[~hit.reindex(remaining.index, fill_value=False)]
    if not frames:
        return None
    merged = pd.concat(frames)
    return merged.loc[sorted(merged.index)]


def _attach_details_extras(frame: pd.DataFrame) -> None:
    """Fold stripped message + facility/severity into the details dicts
    (the reference mutates msg_dict in place, server.py:185-191)."""
    for det, msg, fac, sev in zip(
        frame["_details"], frame["message"], frame["facility"], frame["severity"]
    ):
        if msg is not None:
            det["message"] = msg
        if fac is not None:
            det["facility"] = int(fac)
            det["severity"] = int(sev)


# ---------------------------------------------------------------------------
# stage B: tag-gated message match + casts + emit (M2/M3/M5/M6/M9)


def _apply_casts(captures: dict, casts: dict) -> dict:
    if not casts:
        return captures
    from ..compat import cast as cast_fn

    out = dict(captures)
    for key, fn_name in casts.items():
        val = out.get(key)
        if val is not None:
            out[key] = cast_fn(val, fn_name)
    return out


def _build_yang(mapping: dict, captures: dict) -> dict:
    from ..compat import setval

    oc: dict = {}
    for path_tpl, source_key in mapping.get("variables", {}).items():
        oc = setval(path_tpl.format(**captures), captures[source_key], oc)
    for path_tpl, literal in mapping.get("static", {}).items():
        oc = setval(path_tpl.format(**captures), literal, oc)
    return oc


_OC_FAILED = object()  # sentinel: profile matched but object generation failed

#: capture names that identify the affected entity, in priority order —
#: feeds the CEP stage (up/down pairing keys on (host, entity), the
#: relational analog of the reference's per-entity gauges,
#: transport/prometheus.py:70-93)
_ENTITY_KEYS = ("interface", "neighbor", "peer", "user")


def _entity_of(captures: dict):
    for key in _ENTITY_KEYS:
        val = captures.get(key)
        if val is not None:
            return str(val)
    return None


def _message_stage(osp: OsProfile, parsed: pd.DataFrame) -> pd.DataFrame:
    """Match message profiles against the parsed frame; emit envelopes.

    Profiles are indexed by the gate field (``tag``) so a message regex
    only ever runs on rows whose tag references it — reference
    device.py:143-147's cheap-predicate-first ordering, applied to a
    whole Arrow batch via a hash groupby.
    """
    hits: dict = {}  # row index -> (error, model, yang_obj, state, state_tag)
    matched = pd.Series(False, index=parsed.index)

    match_fields = {mp.match_on for mp in osp.messages}
    for match_field in match_fields:
        if match_field == "tag":
            gate_values = parsed["tag"]
        else:
            gate_values = parsed["_details"].map(lambda d: d.get(match_field))
        index = {}
        for mp in osp.messages:
            if mp.match_on == match_field:
                index.setdefault(mp.tag, []).append(mp)
        for tag_value, group_idx in gate_values.groupby(gate_values, sort=False).groups.items():
            candidates = index.get(tag_value)
            if not candidates:
                continue
            pending = parsed.loc[group_idx]
            pending = pending[~matched.loc[group_idx]]
            for mp in candidates:
                if pending.empty:
                    break
                if mp.python_path is not None:
                    # tag equality alone selects a python profile
                    # (device.py:149-155); its emit() builds the object;
                    # an emit exception publishes nothing (device.py:327-333)
                    for i, det in zip(pending.index, pending["_details"]):
                        yang = python_emit(mp.python_path, det)
                        hits[i] = (
                            mp.error,
                            mp.model,
                            yang if yang is not None else _OC_FAILED,
                            mp.state,
                            mp.state_tag if mp.state is not None else None,
                            _entity_of(det),
                        )
                        matched.loc[i] = True
                    pending = pending.iloc[0:0]
                    continue
                cp = mp.pattern
                rx = cp.regex()
                matches = pending["message"].map(
                    lambda m: rx.search(m) if isinstance(m, str) else None
                )
                hit_mask = matches.notna()
                if not hit_mask.any():
                    continue
                for i, m in matches[hit_mask].items():
                    captures = _apply_casts(
                        {nm: m.group(g) for nm, g in cp.group_index.items()},
                        cp.casts,
                    )
                    try:
                        yang = _build_yang(mp.mapping, captures)
                    except Exception:
                        yang = _OC_FAILED
                    hits[i] = (
                        mp.error,
                        mp.model,
                        yang,
                        mp.state,
                        mp.state_tag if mp.state is not None else None,
                        _entity_of(captures),
                    )
                    matched.loc[i] = True
                pending = pending[~hit_mask]

    def _col(pos):
        return [hits[i][pos] if i in hits else None for i in parsed.index]

    res = pd.DataFrame(
        {
            "error": _col(0),
            "yang_model": _col(1),
            "yang_message": pd.Series(_col(2), index=parsed.index, dtype=object),
            "state": _col(3),
            "state_tag": _col(4),
            "entity": _col(5),
            "_matched": matched,
        },
        index=parsed.index,
    )
    return res


# ---------------------------------------------------------------------------
# the full batch transform


def normalize_pandas(
    pdf: pd.DataFrame,
    registry: ProfileRegistry,
    *,
    default_year: int = 2017,
    include_unknown: bool = True,
    include_raw: bool = True,
    ip: str = DEFAULT_IP,
) -> pd.DataFrame:
    """Normalize one Arrow batch of transcript rows into envelope rows."""
    if pdf.empty:
        return pd.DataFrame({c: [] for c in _OUT_COLS})
    pdf = pdf.reset_index(drop=True)
    texts = pdf["text"].astype(str)
    # fallback event-time epochs (determinism: event time, never now())
    ts_col = pd.to_datetime(pdf["ts"]) if "ts" in pdf.columns else None
    if ts_col is not None:
        fallback_epoch = pd.Series(
            (ts_col.astype("int64") // 1_000_000_000), dtype="Int64"
        ).mask(ts_col.isna().values, pd.NA)
    else:
        fallback_epoch = pd.Series([pd.NA] * len(pdf), dtype="Int64")

    out_frames = []
    matched_any = pd.Series(False, index=pdf.index)
    for os_name, osp in registry.oses.items():
        parsed = _prefix_stage(texts, osp, default_year)
        if parsed is None or parsed.empty:
            continue
        matched_any.loc[parsed.index] = True
        _attach_details_extras(parsed)
        msg_res = _message_stage(osp, parsed)
        env = pd.DataFrame(index=parsed.index)
        env["os"] = os_name
        is_matched = msg_res["_matched"]
        # a matched profile whose object generation failed publishes
        # nothing at all (reference device.py:327-333)
        oc_failed = msg_res["yang_message"].map(lambda y: y is _OC_FAILED)
        env["error"] = msg_res["error"].where(is_matched, "RAW")
        env["yang_model"] = msg_res["yang_model"].where(is_matched, "raw")
        env["yang_message"] = msg_res["yang_message"].where(~oc_failed, None)
        env["state"] = msg_res["state"]
        env["state_tag"] = msg_res["state_tag"]
        env["entity"] = msg_res["entity"]
        env["host"] = parsed["host"]
        env["facility"] = parsed["facility"]
        env["severity"] = parsed["severity"]
        env["tag"] = parsed["tag"]
        env["message"] = parsed["message"]
        env["message_details"] = parsed["_details"]
        env["timestamp"] = parsed["_epoch"]
        keep = ~oc_failed
        if not include_raw:
            keep &= is_matched
        out_frames.append(env[keep])

    if include_unknown and (~matched_any).any():
        unk_idx = pdf.index[~matched_any]
        unk = pd.DataFrame(index=unk_idx)
        unk["os"] = "unknown"
        unk["error"] = "UNKNOWN"
        unk["yang_model"] = "unknown"
        unk["yang_message"] = None
        unk["state"] = None
        unk["state_tag"] = None
        unk["host"] = "unknown"
        unk["facility"] = None
        unk["severity"] = None
        unk["tag"] = None
        unk["message"] = None
        unk["entity"] = None
        unk["message_details"] = [{"message": t} for t in texts[unk_idx]]
        unk["timestamp"] = None
        out_frames.append(unk)

    if not out_frames:
        return pd.DataFrame({c: [] for c in _OUT_COLS})

    res = pd.concat(out_frames)
    res["_ord"] = res.index
    res = res.sort_values(["_ord", "os"], kind="mergesort")

    base = pdf[[c for c in ("conv_id", "turn_idx", "role", "tool", "ts") if c in pdf.columns]]
    res = res.join(base)
    res["ip"] = ip
    fallback = fallback_epoch.reindex(res["_ord"].values)
    res["timestamp"] = pd.array(
        [
            int(t)
            if t is not None and not (isinstance(t, float) and np.isnan(t))
            else (int(fb) if fb is not pd.NA else None)
            for t, fb in zip(res["timestamp"], fallback)
        ],
        dtype="Int64",
    )
    res["yang_message"] = res["yang_message"].map(
        lambda y: canonical_json(y) if y is not None else None
    )
    res["message_details"] = res["message_details"].map(
        lambda d: canonical_json(d) if d is not None else None
    )
    for col, dtype in (
        ("turn_idx", "Int64"),
        ("facility", "Int64"),
        ("severity", "Int64"),
        ("state", "Int64"),
        ("timestamp", "Int64"),
    ):
        if col in res.columns:
            res[col] = pd.array(
                [None if pd.isna(v) else int(v) for v in res[col]],
                dtype="Int64",
            )
    for col in _OUT_COLS:
        if col not in res.columns:
            res[col] = None
    return res[_OUT_COLS]


def normalize(
    df,
    registry: ProfileRegistry | None = None,
    *,
    profile_dir: str | None = None,
    default_year: int = 2017,
    include_unknown: bool = True,
    include_raw: bool = True,
    ip: str = DEFAULT_IP,
):
    """Spark entry: transcript DataFrame → envelope DataFrame (exploded).

    Works identically on batch and streaming DataFrames (mapInPandas is
    streaming-safe and stateless).
    """
    registry = registry or load_registry(profile_dir)

    def _batches(iterator: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            yield normalize_pandas(
                pdf,
                registry,
                default_year=default_year,
                include_unknown=include_unknown,
                include_raw=include_raw,
                ip=ip,
            )

    return df.mapInPandas(_batches, schema=ENVELOPE_SCHEMA)
