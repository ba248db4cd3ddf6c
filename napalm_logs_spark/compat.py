"""Semantics-equivalent utility functions the profile corpus relies on.

These are independent implementations of the small, publicly-documented
helper semantics the reference's profile language depends on:

* ``setval``   — build a nested dict from a ``//``-delimited path
                 (reference: napalm_logs/utils/__init__.py:276-301)
* ``traverse`` — read a nested dict via a ``//``-delimited path
                 (reference: utils/__init__.py:304-338)
* ``cast``     — named cast functions applied to regex captures
                 (reference: utils/__init__.py:195-238)
* ``extract``  — ordered-group regex extraction used by python-module
                 profiles (reference: utils/__init__.py:265-272)
* ``deep_merge`` — recursive config merge with list-extend semantics
                 (reference: utils/__init__.py:341-381 ``dictupdate``)

A tiny import shim (:func:`install_profile_shims`) makes third-party
profile *data* modules that say ``import napalm_logs.utils`` work
without the reference package being installed: the names resolve to the
implementations in this module.
"""

from __future__ import annotations

import re
import sys
import types
from datetime import datetime, timezone
from functools import lru_cache

DELIM = "//"

# ---------------------------------------------------------------------------
# nested-dict path helpers


def setval(path: str, value, dict_: dict | None = None, delim: str = DELIM) -> dict:
    """Set ``value`` under the ``delim``-separated ``path`` inside ``dict_``.

    ``setval('a//b//c', 1)`` → ``{'a': {'b': {'c': 1}}}``.  Intermediate
    levels are created as dicts; an existing leaf at the final key is
    overwritten.  (Parameter named ``dict_`` because python-module
    profiles call it by keyword.)
    """
    if dict_ is None:
        dict_ = {}
    node = dict_
    parts = path.split(delim)
    for part in parts[:-1]:
        nxt = node.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            node[part] = nxt
        node = nxt
    node[parts[-1]] = value
    return dict_


def traverse(data, path: str, delim: str = DELIM):
    """Walk ``data`` following a ``delim``-separated path; None if absent."""
    node = data
    for part in path.split(delim):
        if isinstance(node, list):
            found = None
            for element in node:
                if isinstance(element, dict) and part in element:
                    found = element[part]
                    break
            if found is None:
                try:
                    node = node[int(part)]
                    continue
                except (ValueError, IndexError):
                    return None
            node = found
        elif isinstance(node, dict):
            if part not in node:
                return None
            node = node[part]
        else:
            return None
    return node


# ---------------------------------------------------------------------------
# cast functions (the profile language's scalar function registry)


def color_to_severity(value):
    return {"RED": 3, "YELLOW": 4}.get(value, value)


def bgp_state_convert(state):
    mapped = {
        "OpenSent": "OPEN_SENT",
        "OpenConfirm": "OPEN_CONFIRM",
        "Up": "ESTABLISHED",
        "Down": "ACTIVE",
    }
    return mapped.get(state, state.upper())


def bfd_state_convert(state):
    return {"AdminDown": "ADMIN_DOWN"}.get(state, state.upper())


_LOCAL_CASTS = {
    "color_to_severity": color_to_severity,
    "bgp_state_convert": bgp_state_convert,
    "bfd_state_convert": bfd_state_convert,
}

_BUILTIN_CASTS = {"int": int, "float": float, "str": str, "bool": bool}


def cast(value, function_name: str):
    """Apply a named cast to a captured value.

    Resolution order mirrors the profile language: python builtins
    (``int``), then ``str`` methods (``upper``), then the local
    converter registry; unknown names return the value unchanged, and a
    builtin raising ``ValueError`` also returns the value unchanged.
    """
    fn = _BUILTIN_CASTS.get(function_name)
    if fn is not None:
        try:
            return fn(value)
        except ValueError:
            return value
    str_method = getattr(str, function_name, None)
    if callable(str_method):
        return str_method(value)
    local = _LOCAL_CASTS.get(function_name)
    if local is not None:
        return local(value)
    return value


# ---------------------------------------------------------------------------
# ordered-group regex extraction (python-module profile helper)


@lru_cache(maxsize=512)
def _compiled_ci(rgx: str):
    # python-module profiles pass pattern STRINGS per call; going through
    # re.search would re-hit re._compile's cache lookup on every row
    return re.compile(rgx, re.I)


def extract(rgx, msg: str, mapping, time_format=None):
    """Match ``rgx`` (case-insensitive) and zip groups with ``mapping`` keys.

    Optionally resolve ``time_format = (template, strptime_fmt)`` into an
    epoch ``timestamp`` field computed in UTC.
    """
    matched = _compiled_ci(rgx).search(msg) if isinstance(rgx, str) else re.search(rgx, msg, re.I)
    if not matched:
        return None
    out = {}
    for name, group in zip(mapping.keys(), matched.groups()):
        out[name] = group
    if time_format:
        try:
            parsed = datetime.strptime(time_format[0].format(**out), time_format[1])
            out["timestamp"] = int(
                parsed.replace(tzinfo=timezone.utc).timestamp()
            )
        except ValueError:
            pass
    return out


# ---------------------------------------------------------------------------
# recursive config merge


def deep_merge(dest: dict, update: dict) -> dict:
    """Merge ``update`` into ``dest``: dicts recurse, lists extend
    (skipping elements already present), scalars overwrite.  When the two
    mappings share no keys, this is a plain ``dict.update``."""
    if not (set(dest) & set(update)):
        dest.update(update)
        return dest
    for key, val in update.items():
        existing = dest.get(key)
        if isinstance(existing, dict) and isinstance(val, dict):
            dest[key] = deep_merge(existing, val)
        elif isinstance(existing, list) and isinstance(val, list):
            merged = list(existing)
            merged.extend(x for x in val if x not in merged)
            dest[key] = merged
        else:
            dest[key] = val
    return dest


# ---------------------------------------------------------------------------
# import shim for python-module profiles


def install_profile_shims() -> None:
    """Register ``napalm_logs.utils`` / ``napalm_logs.config`` shim modules
    so profile *data* directories containing python modules (the escape
    hatch for messages a regex template can't express) import cleanly
    without the reference package.  No reference code is executed or
    copied — the shims point at the implementations in this module.
    """
    if "napalm_logs" in sys.modules and hasattr(sys.modules["napalm_logs"], "utils"):
        return
    pkg = types.ModuleType("napalm_logs")
    utils_mod = types.ModuleType("napalm_logs.utils")
    for name in ("setval", "traverse", "cast", "extract",
                 "color_to_severity", "bgp_state_convert", "bfd_state_convert"):
        setattr(utils_mod, name, globals()[name])
    config_mod = types.ModuleType("napalm_logs.config")
    config_mod.OPEN_CONFIG_NO_MODEL = "NO_MODEL"
    config_mod.DEFAULT_DELIM = DELIM
    pkg.utils = utils_mod
    pkg.config = config_mod
    sys.modules["napalm_logs"] = pkg
    sys.modules["napalm_logs.utils"] = utils_mod
    sys.modules["napalm_logs.config"] = config_mod
