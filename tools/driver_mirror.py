"""Run the driver's correctness gate locally for a chosen query subset.

Mirrors the per-round CORRECTNESS_r{N} compare (row count, column set,
order-insensitive canonical values) at the driver's scale factor
(sf0.01 by default) so a priority-list rotation can be proven green
BEFORE the round's driver run reads it.

Usage:
    python tools/driver_mirror.py                 # the _PRIORITY_50 set
    python tools/driver_mirror.py name1 name2 ... # explicit subset
    SF_DIR=/root/testdata/sf0.001 python tools/driver_mirror.py
"""

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    return str(v)


# VERDICT r3 finding #2: the value canonicalization above erases the
# int64-vs-float64 difference the driver's hash sees (DuckDB HUGEINT →
# pandas float64 vs Spark int64: 844.0 vs 844).  Compare dtype KINDS
# strictly so that class can never pass the mirror again.  Nullable int
# columns legitimately land as float64 on BOTH engines (NaN promotion),
# so same-kind is still fine; the failure mode is one side integral and
# the other float.
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


def _canon(df, cols):
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False)
    ]
    return sorted(rows)


def main() -> int:
    names = sys.argv[1:] or list(entrymod._PRIORITY_50)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("driver-mirror")
        .getOrCreate()
    )
    q, o = entrymod.queries(), entrymod.oracle_sql()
    results, n_fail = {}, 0
    for name in names:
        t0 = time.time()
        try:
            got = q[name](spark, SF_DIR).toPandas()
            exp = _duck(o[name])
            cols_ok = sorted(got.columns) == sorted(exp.columns)
            rows_ok = len(got) == len(exp)
            cols = sorted(got.columns)
            dtype_bad = _dtype_mismatches(got, exp, cols) if cols_ok else []
            vals_ok = (cols_ok and rows_ok and not dtype_bad
                       and _canon(got, cols) == _canon(exp, cols))
            ok = cols_ok and rows_ok and vals_ok
            results[name] = {
                "rows_match": rows_ok,
                "schema_match": cols_ok,
                "hash_match": vals_ok,
                "dtype_mismatch": dtype_bad or None,
                "spark_rows": len(got),
                "oracle_rows": len(exp),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as exc:  # noqa: BLE001 - report, keep going
            ok = False
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300],
                             "sec": round(time.time() - t0, 2)}
        n_fail += 0 if ok else 1
        print(f"{'ok ' if ok else 'FAIL'} {name:28s} {results[name].get('sec','?')}s",
              flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "n": len(names), "fail": n_fail}))
    out = "/tmp/driver_mirror.json"
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
