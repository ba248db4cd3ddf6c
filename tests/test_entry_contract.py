"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet (sf0.001 for
speed; the driver uses sf0.01) and compare row count, column names, and
order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    return str(v)


def _canon(df, cols):
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


# VERDICT r3 finding #2: _canon_cell alone canonicalizes 844.0 → "844",
# which hides the int64-vs-float64 dtype class the driver's value hash
# fails on (DuckDB HUGEINT sums land in pandas as float64).  Compare
# dtype KINDS strictly as well — one side integral, other float is a
# failure even when every value is numerically identical.
_KIND_GROUP = {"i": "int", "u": "int", "f": "float", "b": "bool",
               "M": "datetime", "m": "timedelta", "O": "object"}


def _dtype_mismatches(got, exp, cols):
    bad = []
    for c in cols:
        g = _KIND_GROUP.get(got[c].dtype.kind, got[c].dtype.kind)
        e = _KIND_GROUP.get(exp[c].dtype.kind, exp[c].dtype.kind)
        if g != e:
            bad.append(f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}")
    return bad


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema == entrymod.entry(spark).schema


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_runs(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    fn = entrymod.queries()[name]
    got = fn(spark, SF_DIR).toPandas()
    exp = _duck(entrymod.oracle_sql()[name])
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    )
    cols = sorted(got.columns)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    dtype_bad = _dtype_mismatches(got, exp, cols)
    assert not dtype_bad, f"{name}: dtype mismatches {dtype_bad}"
    g, e = _canon(got, cols), _canon(exp, cols)
    mism = [(a, b) for a, b in zip(g, e) if a != b][:5]
    assert g == e, f"{name}: first mismatches {mism}"


def test_dtype_strict_mirror_catches_int_float():
    """Regression for VERDICT r3 #2: an int64 Spark column vs a float64
    oracle column with numerically identical values (844 vs 844.0) must
    FAIL the mirror, because the driver's value hash fails it."""
    import pandas as pd

    got = pd.DataFrame({"k": ["a", "b"], "v": pd.array([844, 7], dtype="int64")})
    exp = pd.DataFrame({"k": ["a", "b"], "v": pd.array([844.0, 7.0], dtype="float64")})
    bad = _dtype_mismatches(got, exp, ["k", "v"])
    assert bad == ["v: spark=int64 oracle=float64"]
    # the value canonicalization alone would have (wrongly) passed:
    assert _canon(got, ["k", "v"]) == _canon(exp, ["k", "v"])
    # same-kind float columns (NaN-promoted nullable ints on both
    # engines) stay acceptable:
    both_f = pd.DataFrame({"v": pd.array([844.0, None], dtype="float64")})
    assert _dtype_mismatches(both_f, both_f.copy(), ["v"]) == []

    from tools.driver_mirror import _dtype_mismatches as mirror_check
    assert mirror_check(got, exp, ["v"]) == ["v: spark=int64 oracle=float64"]


def test_every_query_has_oracle_or_reason():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o.issubset(q)
    # every query is gated: SQL-mirrorable ones against DuckDB SQL, the
    # rest (incl. the seed-deterministic ANN entries) against stored
    # independent goldens — no rows-only entries remain
    rows_only = q - o
    assert rows_only == set(), rows_only
