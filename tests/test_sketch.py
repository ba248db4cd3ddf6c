"""Count-Min sketch semantics (operators/sketch.py): the one-sided
error bound, counter-wise mergeability, absent-key estimates, and
partitioning invariance."""

from pyspark.sql import functions as F

from napalm_logs_spark.operators.sketch import (
    cms_estimate,
    cms_vs_exact,
    count_min_sketch,
)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "key string")


def test_one_sided_bound_and_exact_when_wide(spark):
    # 26 keys with frequencies 1..26
    vals = [c * 3 for c in "abcdefghijklmnopqrstuvwxyz" for _ in range(ord(c) - 96)]
    df = _keys(spark, vals)
    got = {r["key"]: r for r in cms_vs_exact(df, depth=4, width=1024).collect()}
    assert len(got) == 26
    for r in got.values():
        assert r["cms_est"] >= r["exact"]  # never undercounts
        assert r["overcount"] >= 0
    # 1024 buckets x 4 rows over 26 keys: no key collides in all rows
    assert all(r["overcount"] == 0 for r in got.values())


def test_collisions_overcount_but_never_undercount(spark):
    vals = [f"k{i}" for i in range(200) for _ in range(i % 5 + 1)]
    df = _keys(spark, vals)
    rows = cms_vs_exact(df, depth=2, width=16).collect()
    assert len(rows) == 200
    assert all(r["cms_est"] >= r["exact"] for r in rows)
    # 200 keys into 16 buckets MUST collide somewhere
    assert any(r["overcount"] > 0 for r in rows)


def test_mergeability(spark):
    # sketch(A + B) == counter-wise sum of sketch(A) and sketch(B)
    a = _keys(spark, ["x", "y", "x", "z"])
    b = _keys(spark, ["x", "w", "w"])
    whole = count_min_sketch(a.unionAll(b), depth=3, width=32)
    merged = (
        count_min_sketch(a, depth=3, width=32)
        .unionAll(count_min_sketch(b, depth=3, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = {(r["d"], r["bucket"]): r["cnt"] for r in whole.collect()}
    m = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert w == m


def test_absent_key_estimate_nonnegative(spark):
    corpus = _keys(spark, ["a", "a", "b"])
    sketch = count_min_sketch(corpus, depth=4, width=64)
    probes = _keys(spark, ["a", "never-seen"])
    got = {r["key"]: r["cms_est"] for r in cms_estimate(sketch, probes, depth=4, width=64).collect()}
    assert got["a"] >= 2
    assert got["never-seen"] >= 0  # collision mass only


def test_partitioning_invariance(spark):
    vals = [f"k{i % 37}" for i in range(500)]
    df = _keys(spark, vals)
    s1 = count_min_sketch(df.repartition(1), depth=4, width=128)
    s7 = count_min_sketch(df.repartition(7), depth=4, width=128)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s7.collect()))


def test_bloom_no_false_negatives(spark):
    from napalm_logs_spark.operators.sketch import bloom_build, bloom_candidates

    hist = _keys(spark, [f"h{i}" for i in range(300)])
    bits = bloom_build(hist, k=5, m=4096)
    got = {
        r["key"]: r["bloom_candidate"]
        for r in bloom_candidates(bits, hist, k=5, m=4096).collect()
    }
    assert all(got.values())  # every present key is a candidate — always


def test_bloom_incremental_dedup_matches_exact_semantics(spark):
    from napalm_logs_spark.operators.sketch import incremental_dedup_bloom

    hist = _keys(spark, [f"k{i}" for i in range(100)])
    batch = _keys(spark, [f"k{i}" for i in range(80, 140)])
    # deliberately tiny m: false positives guaranteed, verify must fix them
    rows = incremental_dedup_bloom(batch, hist, k=4, m=64).collect()
    assert len(rows) == 60
    for r in rows:
        truth = int(r["key"][1:]) < 100
        assert r["is_dup"] is truth          # verify join corrects every FP
        assert r["kept"] is (not truth)
        if r["is_dup"]:
            assert r["bloom_candidate"]      # no false negatives
    assert any(r["bloom_candidate"] and not r["is_dup"] for r in rows), \
        "tiny m must produce false positives for this test to bite"


def test_bloom_bits_mergeable(spark):
    from napalm_logs_spark.operators.sketch import bloom_build

    a = _keys(spark, ["x", "y"])
    b = _keys(spark, ["y", "z"])
    whole = sorted(r["pos"] for r in bloom_build(a.unionAll(b), k=3, m=512).collect())
    merged = sorted(
        r["pos"]
        for r in bloom_build(a, k=3, m=512)
        .unionAll(bloom_build(b, k=3, m=512))
        .distinct()
        .collect()
    )
    assert whole == merged


def test_hll_registers_merge_and_partitioning_invariance(spark):
    # registers(A ∪ B) == max-merge of registers(A), registers(B), and
    # the register table is invariant to input partitioning
    from napalm_logs_spark.operators.sketch import hll_registers

    a = _keys(spark, [f"k{i}" for i in range(300)])
    b = _keys(spark, [f"k{i}" for i in range(200, 500)])
    whole = hll_registers(a.unionAll(b), p=8)
    merged = (
        hll_registers(a, p=8)
        .unionAll(hll_registers(b, p=8))
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    w = {(r["bucket"]): r["max_rank"] for r in whole.collect()}
    m = {(r["bucket"]): r["max_rank"] for r in merged.collect()}
    assert w == m
    rep = hll_registers(a.unionAll(b).repartition(13), p=8)
    assert {(r["bucket"]): r["max_rank"] for r in rep.collect()} == w


def test_hll_estimate_accuracy_and_duplicate_blindness(spark):
    # raw estimator regime (n >> 2.5m): within ~5 sigma of truth, and
    # duplicates do not move the estimate (the dedup-health property)
    from napalm_logs_spark.operators.sketch import hll_vs_exact

    n = 20000
    uniq = _keys(spark, [f"u{i}" for i in range(n)])
    row = hll_vs_exact(uniq, p=8).collect()[0]
    m = row["m"]
    assert m == 256 and row["exact_distinct"] == n
    sigma = 1.04 / (m ** 0.5)
    assert abs(row["est_distinct"] - n) / n < 5 * sigma
    dup = uniq.unionAll(uniq).unionAll(uniq)
    row2 = hll_vs_exact(dup, p=8).collect()[0]
    assert row2["est_distinct"] == row["est_distinct"]
    assert row2["s_scaled"] == row["s_scaled"]


def test_hll_small_range_discloses_v_empty(spark):
    # tiny cardinality: v_empty is most of m, the signal a caller uses
    # to switch to linear counting client-side (documented contract)
    from napalm_logs_spark.operators.sketch import hll_vs_exact

    row = hll_vs_exact(_keys(spark, [f"x{i}" for i in range(10)]), p=8).collect()[0]
    assert row["exact_distinct"] == 10
    assert row["v_empty"] >= 246  # ≥ m − 10
    assert row["s_scaled"] > 0


def test_hll_grouped_matches_per_group_run(spark):
    from napalm_logs_spark.operators.sketch import hll_vs_exact

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"k{i}") for i in range(900)], "grp string, key string"
    )
    grouped = {
        r["grp"]: (r["s_scaled"], r["est_distinct"])
        for r in hll_vs_exact(df, "key", ("grp",), p=8).collect()
    }
    for g in ("g0", "g1", "g2"):
        solo = hll_vs_exact(df.filter(F.col("grp") == g), "key", p=8).collect()[0]
        assert grouped[g] == (solo["s_scaled"], solo["est_distinct"])


def test_hll_overlap_inclusion_exclusion(spark):
    from napalm_logs_spark.operators.sketch import hll_overlap

    # A = 0..1999, B = 1000..2999 — truth: |A|=|B|=2000, |A∪B|=3000,
    # |A∩B|=1000, J=1/3.  Raw-HLL at p=8 is a few-percent estimator.
    a = _keys(spark, [f"k{i}" for i in range(2000)])
    b = _keys(spark, [f"k{i}" for i in range(1000, 3000)])
    row = hll_overlap(a, b, "key", p=8).collect()[0]
    assert row.m == 256
    for est, truth in [
        (row.est_a, 2000), (row.est_b, 2000), (row.est_union, 3000),
        (row.est_overlap, 1000),
    ]:
        assert abs(est - truth) / truth < 0.25, (est, truth)
    assert abs(row.est_jaccard - 1 / 3) < 0.15
    # disjoint sets: overlap estimate is near zero relative to the sets
    c = _keys(spark, [f"z{i}" for i in range(2000)])
    row2 = hll_overlap(a, c, "key", p=8).collect()[0]
    assert abs(row2.est_overlap) < 0.2 * row2.est_union


def test_hll_merge_equals_union_sketch(spark):
    from napalm_logs_spark.operators.sketch import (
        hll_merge,
        hll_registers,
    )

    a = _keys(spark, [f"k{i}" for i in range(500)])
    b = _keys(spark, [f"k{i}" for i in range(300, 900)])
    merged = {
        (r.bucket, r.max_rank)
        for r in hll_merge(
            hll_registers(a, "key", p=8), hll_registers(b, "key", p=8)
        ).collect()
    }
    direct = {
        (r.bucket, r.max_rank)
        for r in hll_registers(a.unionAll(b), "key", p=8).collect()
    }
    assert merged == direct
