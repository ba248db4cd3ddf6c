"""Unit tests for the profile-language helper semantics."""

from napalm_logs_spark.compat import (
    bfd_state_convert,
    bgp_state_convert,
    cast,
    color_to_severity,
    deep_merge,
    extract,
    setval,
    traverse,
)


def test_setval_builds_hierarchy():
    assert setval("a//b//c", 1) == {"a": {"b": {"c": 1}}}


def test_setval_merges_into_existing():
    d = setval("x//y", 1)
    setval("x//z", 2, dict_=d)
    assert d == {"x": {"y": 1, "z": 2}}


def test_setval_overwrites_leaf():
    d = setval("a//b", 1)
    setval("a//b", 2, dict_=d)
    assert d == {"a": {"b": 2}}


def test_traverse():
    d = {"a": {"b": {"c": 5}}}
    assert traverse(d, "a//b//c") == 5
    assert traverse(d, "a//x") is None
    assert traverse(d, "a//b//c//d") is None


def test_cast_builtin_int():
    assert cast("42", "int") == 42
    assert cast("notanint", "int") == "notanint"  # ValueError → unchanged


def test_cast_str_method():
    assert cast("down", "upper") == "DOWN"


def test_cast_converters():
    assert color_to_severity("RED") == 3
    assert color_to_severity("GREEN") == "GREEN"
    assert bgp_state_convert("OpenSent") == "OPEN_SENT"
    assert bgp_state_convert("Connect") == "CONNECT"
    assert bfd_state_convert("AdminDown") == "ADMIN_DOWN"
    assert cast("Up", "bgp_state_convert") == "ESTABLISHED"


def test_cast_unknown_function_is_identity():
    assert cast("v", "no_such_fn") == "v"


def test_extract_ordered_groups():
    out = extract(r"(\w+) (\d+)", "eth0 42", {"iface": None, "count": None})
    assert out == {"iface": "eth0", "count": "42"}
    assert extract(r"(\d+)", "nope", {"x": None}) is None


def test_extract_time_format():
    out = extract(
        r"(\d{4})-(\d{2})",
        "2017-07",
        {"y": None, "m": None},
        time_format=("{y}-{m}-01", "%Y-%m-%d"),
    )
    assert out["timestamp"] == 1498867200


def test_deep_merge_lists_extend_dicts_recurse():
    a = {"messages": [1], "cfg": {"x": 1}}
    deep_merge(a, {"messages": [2, 1], "cfg": {"y": 2}})
    assert a == {"messages": [1, 2], "cfg": {"x": 1, "y": 2}}
