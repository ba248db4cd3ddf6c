"""Profile corpus loading.

A profile directory tree (the engine's "query language") looks like::

    <root>/
      <os_name>/
        init.yml           # prefixes: [...] — how to peel the transport envelope
        <ERROR>.yml        # messages: [...] — how to parse one message type
        <ERROR>.py         # escape hatch: emit(msg_dict) -> nested dict
        __init__.py        # escape hatch: extract(msg) -> msg_dict

(Directory-layout and merge semantics shared with the reference loader,
``base.py:273-459`` — independent implementation.)

The loaded registry is **plain picklable data** (pattern strings, group
maps, cast names, mapping templates, python-module file paths).  Regexes
compile lazily per executor via an ``lru_cache``; python-module profiles
are exec'd lazily per executor from their source path with the
``napalm_logs.utils`` shim installed.  On a real cluster the registry
rides to executors inside the mapInPandas closure (a broadcast-sized
object: ~110 profiles, a few hundred KB).
"""

from __future__ import annotations

import fnmatch
import os
import re
from dataclasses import dataclass, field
from functools import lru_cache

import yaml

from ..compat import deep_merge, install_profile_shims
from .compiler import CompiledPattern, compile_line

OS_INIT_BASENAMES = ("__init__", "init", "index")
NO_MODEL = "NO_MODEL"

#: default profile corpus: the vendored snapshot of the reference's
#: Apache-2.0 profile *data* (96 YAML profiles + 2 python profiles
#: shipped as ``.pyprofile`` data files, exec'd by the loader exactly
#: like the reference loads its own python profiles) — the engine runs
#: fully standalone.  Override with NLS_PROFILE_DIR to point at any
#: user profile tree; the tiny demo corpus remains as a last resort.
VENDORED_PROFILE_DIR = os.path.join(os.path.dirname(__file__), "vendored")
BUILTIN_PROFILE_DIR = os.path.join(os.path.dirname(__file__), "builtin")
DEFAULT_PROFILE_DIR = VENDORED_PROFILE_DIR


def _materialize_pkg_dir(pkg_path: str) -> str | None:
    """Resolve an in-package data directory to a real filesystem dir.

    Under ``spark-submit --py-files pkg.zip`` the package lives inside a
    zip, so ``os.listdir`` can't walk it — extract the subtree once per
    (zip, mtime) into a cached temp dir.  On a plain checkout this is a
    no-op.  Note for real clusters: only ``.pyprofile`` escape-hatch
    modules are re-read per executor (YAML profiles ride as compiled
    data in the broadcast registry); the same extraction runs lazily on
    each executor that needs them.
    """
    if os.path.isdir(pkg_path):
        return pkg_path
    probe = pkg_path
    while probe and not os.path.isfile(probe):
        parent = os.path.dirname(probe)
        if parent == probe:
            return None
        probe = parent
    import hashlib
    import tempfile
    import zipfile

    if not zipfile.is_zipfile(probe):
        return None
    rel = os.path.relpath(pkg_path, probe).replace(os.sep, "/")
    # stable cache name: hashlib, NOT builtin hash() (PYTHONHASHSEED-
    # randomized — a random name would re-extract every process and
    # leak orphan trees in /tmp)
    key = hashlib.md5(
        f"{probe}:{os.path.getmtime(probe)}".encode()
    ).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"nls_profiles_{key}")
    marker = os.path.join(cache, ".complete")
    target = os.path.join(cache, rel)
    if not os.path.isfile(marker):
        # private staging dir per extractor: a shared ".tmp" would let
        # the rename winner yank the directory out from under a
        # concurrent extractall
        tmp = tempfile.mkdtemp(prefix=f"nls_profiles_{key}_stage_")
        with zipfile.ZipFile(probe) as zf:
            members = [m for m in zf.namelist() if m.startswith(rel + "/")]
            zf.extractall(tmp, members)
        open(os.path.join(tmp, ".complete"), "w").close()
        try:
            os.rename(tmp, cache)
        except OSError:  # concurrent extractor won the race — use theirs
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return target if os.path.isdir(target) else None


@dataclass(frozen=True)
class PrefixProfile:
    pattern: CompiledPattern | None   # None for python-module prefixes
    time_format: str | None = None
    state: int | None = None
    state_tag: str | None = None
    python_path: str | None = None    # path of module defining extract()


@dataclass(frozen=True)
class MessageProfile:
    error: str
    tag: str
    match_on: str
    model: str
    pattern: CompiledPattern | None   # None for python-module messages
    mapping: dict = field(default_factory=lambda: {"variables": {}, "static": {}})
    state: int | None = None
    state_tag: str | None = None
    python_path: str | None = None    # path of module defining emit()


@dataclass(frozen=True)
class OsProfile:
    name: str
    prefixes: tuple
    messages: tuple          # in load order (first match wins)
    messages_by_tag: dict    # tag -> tuple[MessageProfile] for match_on == 'tag'


@dataclass(frozen=True)
class ProfileRegistry:
    oses: dict  # os_name -> OsProfile

    def os_names(self):
        return tuple(self.oses)


# ---------------------------------------------------------------------------
# python-module escape hatch: lazy per-executor exec of profile modules


@lru_cache(maxsize=256)
def _load_profile_module(path: str) -> dict:
    install_profile_shims()
    namespace: dict = {"__file__": path, "__name__": f"_nls_profile_{abs(hash(path))}"}
    with open(path, "r") as fh:
        source = fh.read()
    exec(compile(source, path, "exec"), namespace)
    return namespace


def python_extract(path: str, msg: str):
    """Run a python prefix profile's ``extract(msg)``."""
    fn = _load_profile_module(path).get("extract")
    if fn is None:
        return None
    try:
        return fn(msg)
    except Exception:
        return None


def python_emit(path: str, msg_dict: dict):
    """Run a python message profile's ``emit(msg_dict)``."""
    fn = _load_profile_module(path).get("emit")
    if fn is None:
        return None
    try:
        return fn(dict(msg_dict))
    except Exception:
        return None


def _python_module_meta(path: str) -> dict:
    ns = _load_profile_module(path)
    stem = os.path.splitext(os.path.basename(path))[0]
    return {
        "tag": ns.get("__tag__", stem),
        "error": ns.get("__error__", stem),
        "match_on": ns.get("__match_on__", "tag"),
        "model": ns.get("__yang_model__", NO_MODEL),
        "has_emit": callable(ns.get("emit")),
        "has_extract": callable(ns.get("extract")),
    }


# ---------------------------------------------------------------------------
# whitelist / blacklist pruning (config-time partition pruning analog)


def _expr_match(name: str, expr: str) -> bool:
    try:
        if re.match(expr, name, flags=re.I):
            return True
    except re.error:
        pass
    return fnmatch.fnmatch(name.lower(), expr.lower())


def os_allowed(name: str, whitelist=None, blacklist=None) -> bool:
    """Glob/regex/exact allow-deny of OS names (reference
    ``utils/__init__.py:384-447`` semantics)."""
    if blacklist and any(_expr_match(name, e) for e in blacklist):
        return False
    if whitelist:
        return any(_expr_match(name, e) for e in whitelist)
    return True


# ---------------------------------------------------------------------------
# loading


def _load_os_dir(os_dir: str) -> dict:
    """Merge every yml/py file in an OS directory into one raw config."""
    raw: dict = {}
    for fname in sorted(os.listdir(os_dir)):
        stem, ext = os.path.splitext(fname)
        ext = ext.lstrip(".")
        path = os.path.join(os_dir, fname)
        if ext in ("yml", "yaml"):
            with open(path, "r") as fh:
                cfg = yaml.safe_load(fh)
            if cfg:
                deep_merge(raw, cfg)
        elif ext in ("py", "pyprofile"):
            meta = _python_module_meta(path)
            if stem in OS_INIT_BASENAMES:
                if meta["has_extract"]:
                    raw.setdefault("prefixes", []).append(
                        {"__python_path__": path}
                    )
            elif meta["has_emit"]:
                raw.setdefault("messages", []).append(
                    {
                        "__python_path__": path,
                        "error": meta["error"],
                        "tag": meta["tag"],
                        "match_on": meta["match_on"],
                        "model": meta["model"],
                    }
                )
    return raw


def _build_os_profile(name: str, raw: dict) -> OsProfile:
    prefixes = []
    for p in raw.get("prefixes", []):
        if "__python_path__" in p:
            prefixes.append(PrefixProfile(pattern=None, python_path=p["__python_path__"]))
            continue
        prefixes.append(
            PrefixProfile(
                pattern=compile_line(p.get("line", ""), p.get("values", {}), wrap_prefix=True),
                time_format=p.get("time_format"),
                state=p.get("state"),
                state_tag=p.get("state_tag"),
            )
        )
    messages = []
    for m in raw.get("messages", []):
        if "__python_path__" in m:
            messages.append(
                MessageProfile(
                    error=m["error"], tag=m["tag"], match_on=m.get("match_on", "tag"),
                    model=m.get("model", NO_MODEL), pattern=None,
                    python_path=m["__python_path__"],
                )
            )
            continue
        messages.append(
            MessageProfile(
                error=m["error"],
                tag=m["tag"],
                match_on=m.get("match_on", "tag"),
                model=m.get("model", NO_MODEL),
                pattern=compile_line(m.get("line", ""), m.get("values", {})),
                mapping=m.get("mapping", {"variables": {}, "static": {}}),
                state=m.get("state"),
                state_tag=m.get("state_tag"),
            )
        )
    by_tag: dict = {}
    for mp in messages:
        if mp.match_on == "tag":
            by_tag.setdefault(mp.tag, []).append(mp)
    by_tag = {k: tuple(v) for k, v in by_tag.items()}
    return OsProfile(
        name=name, prefixes=tuple(prefixes), messages=tuple(messages),
        messages_by_tag=by_tag,
    )


def load_registry(path: str | None = None, whitelist=None, blacklist=None) -> ProfileRegistry:
    """Load a profile directory tree into a :class:`ProfileRegistry`.

    Driver-side only; the result is broadcast to executors via closure
    capture.  OS subdirectories are pruned by white/blacklist *before*
    any compilation — the config-time analog of partition pruning.
    """
    if path is None:
        path = os.environ.get("NLS_PROFILE_DIR")
    if path is None:
        path = (
            _materialize_pkg_dir(DEFAULT_PROFILE_DIR)
            or _materialize_pkg_dir(BUILTIN_PROFILE_DIR)
            or DEFAULT_PROFILE_DIR
        )
    if not os.path.isdir(path):
        raise IOError(f"profile directory does not exist: {path}")
    oses = {}
    for entry in sorted(os.listdir(path)):
        os_dir = os.path.join(path, entry)
        if not os.path.isdir(os_dir) or entry.startswith("__"):
            continue
        if not os_allowed(entry, whitelist, blacklist):
            continue
        raw = _load_os_dir(os_dir)
        if raw:
            oses[entry] = _build_os_profile(entry, raw)
    if not oses:
        raise IOError(f"no OS profiles found under {path}")
    return ProfileRegistry(oses=oses)
