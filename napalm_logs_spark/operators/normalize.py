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
import re
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


#: one shared encoder — json.dumps builds a fresh JSONEncoder per call,
#: which is ~30% of its cost at this call volume (hot-path profiled)
_CANONICAL_ENCODER = json.JSONEncoder(
    sort_keys=True, separators=(",", ":"), ensure_ascii=False
).encode


def canonical_json(obj) -> str:
    """Deterministic JSON encoding shared by the engine and the tests."""
    return _CANONICAL_ENCODER(obj)


# ---------------------------------------------------------------------------
# timestamp resolution (M4)

#: deterministic fallback parser table for date shapes a profile did not
#: declare — the reference reaches for dateparser here
#: (device.py:217-224); this engine instead accepts the common syslog /
#: ISO-8601 / RFC-3339 shapes through an explicit, reproducible table
#: (same input → same epoch on every run and every executor; dateparser's
#: locale- and current-date-sensitive behavior cannot promise that).
_FALLBACK_FORMATS = (
    "%b %d %H:%M:%S",            # classic BSD syslog (year-less)
    "%b %d %H:%M:%S.%f",
    "%b %d %Y %H:%M:%S",         # year-present syslog variants
    "%Y %b %d %H:%M:%S",
    "%d %b %Y %H:%M:%S",
    "%Y-%m-%d %H:%M:%S",         # ISO 8601
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S%z",       # RFC 3339 with numeric offset
    "%Y-%m-%dT%H:%M:%S.%f%z",
    # space-separated date+offset: what a profile's {date} {time} split
    # reassembles for ISO-dated syslog (e.g. eos "2020-03-31
    # 08:41:59+00:00" — prefix captures date and time separately)
    "%Y-%m-%d %H:%M:%S%z",
    "%Y-%m-%d %H:%M:%S.%f%z",
    "%m/%d/%Y %H:%M:%S",
    # 2-digit-year shapes (tried after the %Y forms; %y pivots 00-68 →
    # 20xx, 69-99 → 19xx — and a 2-digit year that %Y happens to accept,
    # e.g. "24" → year 24, gets the same pivot in _try_parse)
    "%m/%d/%y %H:%M:%S",
    "%b %d %y %H:%M:%S",
    # syslog shapes with a trailing numeric offset — reached via the
    # tz-abbreviation rewrite below (e.g. "Mar 31 08:41:59 CEST")
    "%b %d %H:%M:%S %z",
    "%b %d %H:%M:%S.%f %z",
    "%b %d %Y %H:%M:%S %z",
    "%Y %b %d %H:%M:%S %z",
    "%d %b %Y %H:%M:%S %z",
)

#: locale month names/abbreviations → month number, the deterministic
#: slice of the reference's dateparser reach (device.py:217-224):
#: en/de/fr/es/pt/it/nl full names and common abbreviations.  Lookup is
#: diacritic-insensitive (NFD-stripped), so "MÄRZ", "märz" and "marz"
#: all resolve.  A collision across locales would be a silent
#: wrong-month bug — the table is asserted conflict-free at import.
_MONTH_NAMES: dict[str, int] = {}


def _strip_accents(s: str) -> str:
    import unicodedata

    return "".join(
        c for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn"
    )


def _register_months(names: tuple, lang: str) -> None:
    for m, raw in enumerate(names, start=1):
        for tok in ([raw] if isinstance(raw, str) else raw):
            key = _strip_accents(tok.lower())
            prev = _MONTH_NAMES.get(key)
            if prev is not None and prev != m:
                # a collision would silently resolve dates to the wrong
                # month — explicit raise (assert would vanish under -O)
                raise ValueError(
                    f"month-token collision: {key!r} = {prev} vs {m} ({lang})"
                )
            _MONTH_NAMES[key] = m


_register_months((
    ("january", "jan"), ("february", "feb"), ("march", "mar"),
    ("april", "apr"), "may", ("june", "jun"), ("july", "jul"),
    ("august", "aug"), ("september", "sep", "sept"),
    ("october", "oct"), ("november", "nov"), ("december", "dec"),
), "en")
_register_months((
    ("januar",), ("februar",), ("märz", "mär", "mrz"), (),
    (), ("juni",), ("juli",), (), (), ("oktober", "okt"),
    (), ("dezember", "dez"),
), "de")
_register_months((
    ("janvier", "janv"), ("février", "févr", "fevr"), ("mars",),
    ("avril", "avr"), ("mai",), ("juin",), ("juillet", "juil"),
    ("août", "aout"), ("septembre",), ("octobre",),
    ("novembre",), ("décembre", "déc"),
), "fr")
_register_months((
    ("enero", "ene"), ("febrero",), ("marzo",), ("abril", "abr"),
    ("mayo",), ("junio",), ("julio",), ("agosto", "ago"),
    ("septiembre", "setiembre"), ("octubre",), ("noviembre",),
    ("diciembre", "dic"),
), "es")
_register_months((
    ("janeiro",), ("fevereiro", "fev"), ("março",), (), ("maio",),
    ("junho",), ("julho",), (), ("setembro", "set"),
    ("outubro", "out"), ("novembro",), ("dezembro",),
), "pt")
_register_months((
    ("gennaio", "gen"), ("febbraio",), (), ("aprile",),
    ("maggio", "mag"), ("giugno", "giu"), ("luglio", "lug"),
    (), ("settembre",), ("ottobre", "ott"), (), ("dicembre",),
), "it")
_register_months((
    ("januari",), ("februari",), ("maart", "mrt"), (), ("mei",),
    (), (), ("augustus",), (), (), (), (),
), "nl")

_EN_ABBR = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
            "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

#: fixed-offset tz abbreviations (the unambiguous-enough common set;
#: where the world disagrees — CST, IST — the table follows
#: dateparser's defaults: US Central, India — and says so here rather
#: than guessing per-message).
_TZ_OFFSETS = {
    "UTC": "+0000", "GMT": "+0000", "UT": "+0000", "Z": "+0000",
    "EST": "-0500", "EDT": "-0400", "CST": "-0600", "CDT": "-0500",
    "MST": "-0700", "MDT": "-0600", "PST": "-0800", "PDT": "-0700",
    "AKST": "-0900", "AKDT": "-0800", "HST": "-1000",
    "WET": "+0000", "WEST": "+0100", "BST": "+0100",
    "CET": "+0100", "CEST": "+0200", "EET": "+0200", "EEST": "+0300",
    "MSK": "+0300", "IST": "+0530", "SGT": "+0800", "HKT": "+0800",
    "JST": "+0900", "KST": "+0900",
    "AEST": "+1000", "AEDT": "+1100", "AWST": "+0800",
    "NZST": "+1200", "NZDT": "+1300",
}

_TZ_TAIL_RE = re.compile(r"^(.*\S)\s+([A-Z]{1,4})$")
_DAY_DOT_RE = re.compile(r"\b(\d{1,2})\.(?=\s)")
#: ordinal day suffixes ("Jan 2nd", "3rd Mar") — a dateparser behavior
#: profiles hit on chat-style date lines; pure suffix strip, never
#: touches e.g. "1st-floor" (requires the token to END at the suffix)
_ORDINAL_RE = re.compile(r"\b(\d{1,2})(?:st|nd|rd|th)\b", re.IGNORECASE)


def _rewrite_candidates(s: str):
    """Deterministic rewrites widening the fallback table's reach:
    Z suffix → +0000, trailing tz abbreviation → numeric offset,
    locale month token → English %b abbreviation, day-dot ("15." de
    style) → "15".  Yields at most a handful of strings; every rewrite
    is a pure string substitution — same input, same candidates, on
    every executor (the reproducibility bar dateparser can't meet)."""
    seen = set()

    def _emit(x):
        if x not in seen:
            seen.add(x)
            yield x

    def _tz(x):
        yield from _emit(x)
        if x.endswith("Z"):
            yield from _emit(x[:-1] + "+0000")
        m = _TZ_TAIL_RE.match(x)
        if m and m.group(2) in _TZ_OFFSETS:
            off = _TZ_OFFSETS[m.group(2)]
            yield from _emit(m.group(1) + " " + off)   # "... %z" shapes
            yield from _emit(m.group(1) + off)         # "...%z" shapes

    def _months(x):
        yield from _tz(x)
        toks = x.split(" ")
        for i, t in enumerate(toks):
            key = _strip_accents(t.rstrip(".,").lower())
            mnum = _MONTH_NAMES.get(key)
            if mnum and not t.isdigit():
                rew = " ".join(toks[:i] + [_EN_ABBR[mnum - 1]] + toks[i + 1:])
                yield from _tz(rew)
                break

    # BSD syslog pads single-digit days with a SECOND space ("Jan  2");
    # strptime tolerates runs of whitespace, but the token-wise month
    # rewrite above splits on single spaces — collapse runs first so
    # "Janvier  2" still finds its month token
    s = re.sub(r"\s{2,}", " ", s)
    yield from _months(s)
    dd = _DAY_DOT_RE.sub(r"\1", s)
    if dd != s:
        yield from _months(dd)
    od = _ORDINAL_RE.sub(r"\1", s)
    if od != s:
        yield from _months(od)


def _try_parse(s: str, fmt: str, default_year: int):
    try:
        parsed = datetime.strptime(s, fmt)
    except (ValueError, TypeError):
        return None
    if parsed.year == 1900:  # format without %Y
        parsed = parsed.replace(year=default_year)
    elif parsed.year < 100:
        # a 2-digit year greedily matched by %Y ("03/31/24" → year 24):
        # apply strptime's own %y pivot (00-68 → 20xx, 69-99 → 19xx) —
        # deterministic, and no log source in this domain predates 1969
        parsed = parsed.replace(
            year=parsed.year + (2000 if parsed.year <= 68 else 1900)
        )
    if parsed.tzinfo is not None:  # offset-aware → normalize to UTC
        return int(parsed.timestamp())
    return calendar.timegm(parsed.timetuple())


@lru_cache(maxsize=65536)
def _resolve_epoch(date: str, time: str, fmt: str | None, default_year: int):
    """Declared profile format first; on miss, the fallback table.

    ``Z``-suffixed RFC-3339 strings are handled by rewriting the suffix
    to ``+0000`` (strptime's %z accepts Z only on some platforms).
    """
    s = f"{date} {time}".strip() if time else str(date).strip()
    if fmt is not None:
        epoch = _try_parse(s, fmt, default_year)
        if epoch is not None:
            return epoch
    for cand in _rewrite_candidates(s):
        for fb in _FALLBACK_FORMATS:
            epoch = _try_parse(cand, fb, default_year)
            if epoch is not None:
                return epoch
    return None


# ---------------------------------------------------------------------------
# stage A: prefix identification (P2/P4), vectorized per (os, prefix)


def _prefix_stage(texts: pd.Series, osp: OsProfile, default_year: int) -> pd.DataFrame | None:
    """First matching prefix wins per OS; returns the partially-parsed
    frame (index ⊆ texts.index) or None when nothing matched.

    Hot loop works on raw numpy object arrays and python dicts — pandas
    indexing is kept out of the per-row path (it dominated the profile).
    """
    txt = texts.to_numpy(dtype=object)
    index = texts.index.to_numpy()
    remaining = range(len(txt))
    rows: dict = {}  # position -> (details, host, tag, message, fac, sev, epoch)

    for pp in osp.prefixes:
        if not remaining:
            break
        still = []
        if pp.python_path is not None:
            path = pp.python_path
            for pos in remaining:
                d = python_extract(path, txt[pos])
                if d is None:
                    still.append(pos)
                    continue
                msg = d.get("message")
                if isinstance(msg, str):
                    msg = msg.strip()
                    d["message"] = msg
                pri = d.get("pri")
                fac = sev = None
                if pri is not None:
                    fac, sev = int(pri) // 8, int(pri) % 8
                epoch = d.pop("timestamp", None)
                rows[pos] = (d, d.get("host"), d.get("tag"), msg, fac, sev, epoch)
            remaining = still
            continue
        cp = pp.pattern
        rx = cp.regex()
        groups = list(cp.group_index.items())
        fmt = pp.time_format
        lit = cp.required_literal
        for pos in remaining:
            s = txt[pos]
            # O(1) necessary-substring gates before the regex engine:
            # every wrapped prefix requires '<' (the pri), plus the
            # template's own longest literal fragment
            if (
                not isinstance(s, str)
                or "<" not in s
                or (lit is not None and lit not in s)
            ):
                still.append(pos)
                continue
            m = rx.search(s)
            if m is None:
                still.append(pos)
                continue
            d = {name: m.group(g) for name, g in groups}
            msg = d.get("message")
            if isinstance(msg, str):
                msg = msg.strip()
                d["message"] = msg
            pri = d.get("pri")
            fac = sev = None
            if pri is not None:
                pri_i = int(pri)
                fac, sev = pri_i // 8, pri_i % 8
            epoch = None
            date, time_ = d.get("date"), d.get("time")
            if date or time_:  # declared fmt first, fallback table after
                epoch = _resolve_epoch(date or "", time_ or "", fmt, default_year)
            rows[pos] = (d, d.get("host"), d.get("tag"), msg, fac, sev, epoch)
        remaining = still

    if not rows:
        return None
    positions = sorted(rows)
    vals = [rows[p] for p in positions]
    return pd.DataFrame(
        {
            "_details": [v[0] for v in vals],
            "host": [v[1] for v in vals],
            "tag": [v[2] for v in vals],
            "message": [v[3] for v in vals],
            "facility": [v[4] for v in vals],
            "severity": [v[5] for v in vals],
            "_epoch": [v[6] for v in vals],
        },
        index=index[positions],
    )


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


#: per-profile compiled YANG path plans, keyed by id(mapping) (the
#: mapping dicts live in the process-lifetime registry).  Each entry
#: pre-splits the '//' template once and marks which segments actually
#: interpolate captures — setval's per-row split and str.format over
#: fully-static paths were ~20% of the whole normalize stage.
_YANG_PLANS: dict = {}


def _yang_plan(mapping: dict):
    plan = _YANG_PLANS.get(id(mapping))
    if plan is None:
        def compile_paths(d):
            out = []
            for path_tpl, payload in d.items():
                segs = path_tpl.split("//")
                dyn = [i for i, s in enumerate(segs) if "{" in s]
                out.append((segs, dyn, payload))
            return out

        plan = (
            compile_paths(mapping.get("variables", {})),
            compile_paths(mapping.get("static", {})),
            mapping,  # keep the dict alive so id() can't be recycled
        )
        _YANG_PLANS[id(mapping)] = plan
    return plan


def _set_parts(oc: dict, segs, dyn, captures, value):
    if dyn:
        segs = list(segs)
        for i in dyn:
            segs[i] = segs[i].format(**captures)
            # parity with setval(path.format(...)): a capture value
            # containing '//' splits into extra nesting levels
            if "//" in segs[i]:
                segs[i : i + 1] = segs[i].split("//")
    node = oc
    for part in segs[:-1]:
        try:
            nxt = node[part]
            if type(nxt) is not dict:  # leaf collision → replace (setval parity)
                nxt = {}
                node[part] = nxt
        except KeyError:
            nxt = {}
            node[part] = nxt
        node = nxt
    node[segs[-1]] = value
    return oc


def _build_yang(mapping: dict, captures: dict) -> dict:
    variables, static, _ = _yang_plan(mapping)
    oc: dict = {}
    for segs, dyn, source_key in variables:
        _set_parts(oc, segs, dyn, captures, captures[source_key])
    for segs, dyn, literal in static:
        _set_parts(oc, segs, dyn, captures, literal)
    return oc


_OC_FAILED = object()  # sentinel: profile matched but object generation failed

#: capture names that identify the affected entity, in priority order —
#: feeds the CEP stage (up/down pairing keys on (host, entity), the
#: relational analog of the reference's per-entity gauges,
#: transport/prometheus.py:70-93).  ``component`` keys the SYSTEM_ALARM
#: gauge (prometheus.py:490-497 labels by component name) and
#: ``reason`` keys the minor/major alarm gauges (prometheus.py:520-527
#: labels by the alarm's additional-text).
_ENTITY_KEYS = ("interface", "neighbor", "peer", "user", "component", "reason")


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
    msg_arr = parsed["message"].to_numpy(dtype=object)
    det_arr = parsed["_details"].to_numpy(dtype=object)
    tag_arr = parsed["tag"].to_numpy(dtype=object)
    hits: dict = {}  # position -> (error, model, yang_obj, state, state_tag, entity)

    match_fields = {mp.match_on for mp in osp.messages}
    for match_field in match_fields:
        profile_index: dict = {}
        for mp in osp.messages:
            if mp.match_on == match_field:
                profile_index.setdefault(mp.tag, []).append(mp)
        # group row positions by gate value (hash gate before any regex)
        groups: dict = {}
        if match_field == "tag":
            for pos, tv in enumerate(tag_arr):
                if tv is not None and tv in profile_index:
                    groups.setdefault(tv, []).append(pos)
        else:
            for pos, det in enumerate(det_arr):
                tv = det.get(match_field)
                if tv is not None and tv in profile_index:
                    groups.setdefault(tv, []).append(pos)

        for tag_value, positions in groups.items():
            pending = [p for p in positions if p not in hits]
            for mp in profile_index[tag_value]:
                if not pending:
                    break
                if mp.python_path is not None:
                    # tag equality alone selects a python profile
                    # (device.py:149-155); its emit() builds the object;
                    # an emit exception publishes nothing (device.py:327-333)
                    for pos in pending:
                        det = det_arr[pos]
                        yang = python_emit(mp.python_path, det)
                        hits[pos] = (
                            mp.error,
                            mp.model,
                            yang if yang is not None else _OC_FAILED,
                            mp.state,
                            mp.state_tag if mp.state is not None else None,
                            _entity_of(det),
                        )
                    pending = []
                    continue
                cp = mp.pattern
                rx = cp.regex()
                groups_items = list(cp.group_index.items())
                casts = cp.casts
                still = []
                for pos in pending:
                    s = msg_arr[pos]
                    m = rx.search(s) if isinstance(s, str) else None
                    if m is None:
                        still.append(pos)
                        continue
                    captures = _apply_casts(
                        {nm: m.group(g) for nm, g in groups_items}, casts
                    )
                    try:
                        yang = _build_yang(mp.mapping, captures)
                    except Exception:
                        yang = _OC_FAILED
                    hits[pos] = (
                        mp.error,
                        mp.model,
                        yang,
                        mp.state,
                        mp.state_tag if mp.state is not None else None,
                        _entity_of(captures),
                    )
                pending = still

    n = len(parsed)

    def _col(slot):
        return [hits[p][slot] if p in hits else None for p in range(n)]

    return pd.DataFrame(
        {
            "error": _col(0),
            "yang_model": _col(1),
            "yang_message": pd.Series(_col(2), index=parsed.index, dtype=object),
            "state": _col(3),
            "state_tag": _col(4),
            "entity": _col(5),
            "_matched": [p in hits for p in range(n)],
        },
        index=parsed.index,
    )


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

    import warnings

    with warnings.catch_warnings():
        # frames legitimately carry all-None object columns (state,
        # state_tag); dtypes are normalized explicitly below, so the
        # pandas-3.0 concat dtype change is immaterial here
        warnings.filterwarnings("ignore", category=FutureWarning,
                                message=".*empty or all-NA.*")
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
