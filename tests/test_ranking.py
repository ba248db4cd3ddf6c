"""Bradley–Terry MM semantics (operators/ranking.py): exact parity
with an independent pure-python replication of the integer recurrence,
pair-count sufficiency, all-losing clamp, ordering sanity, and
partitioning invariance."""

from collections import defaultdict

from napalm_logs_spark.operators.ranking import (
    CONTRIB_SCALE,
    SCALE,
    bt_pair_counts,
    bt_ratings,
)


def _py_bt(outcomes, iterations=8, scale=SCALE, cs=CONTRIB_SCALE):
    """Independent replication: dict-based, same all-integer recurrence."""
    n = defaultdict(int)
    wi = defaultdict(int)
    for w, l in outcomes:
        i, j = min(w, l), max(w, l)
        n[(i, j)] += 1
        if w == i:
            wi[(i, j)] += 1
    items = sorted({x for p in n for x in p})
    wins = defaultdict(int)
    for (i, j), c in n.items():
        wins[i] += wi[(i, j)]
        wins[j] += c - wi[(i, j)]
    target = len(items) * scale
    p = {v: scale for v in items}
    for _ in range(iterations):
        denom = defaultdict(int)
        for (i, j), c in n.items():
            contrib = (c * cs) // (p[i] + p[j])
            denom[i] += contrib
            denom[j] += contrib
        raw = {v: max((wins[v] * cs) // denom[v], 1) for v in items}
        tot = sum(raw.values())
        p = {v: (raw[v] * target) // tot for v in items}
    return p, dict(wins)


def _outcomes(strengths, rounds=40):
    """Deterministic synthetic battle log: in round r, pair (a, b)
    fights once; a wins iff (7*r + 3*a + b) % (sa + sb) < sa — a crude
    but deterministic skill-proportional coin."""
    out = []
    ids = sorted(strengths)
    for r in range(rounds):
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                sa, sb = strengths[a], strengths[b]
                if (7 * r + 3 * a + b) % (sa + sb) < sa:
                    out.append((a, b))
                else:
                    out.append((b, a))
    return out


def _df(spark, outcomes):
    return spark.createDataFrame(outcomes, "winner long, loser long")


def test_pair_counts_sufficient_stats(spark):
    out = [(1, 2), (2, 1), (1, 2), (3, 1)]
    rows = {
        (r["i"], r["j"]): (r["n"], r["wi"])
        for r in bt_pair_counts(_df(spark, out)).collect()
    }
    assert rows == {(1, 2): (3, 2), (1, 3): (1, 0)}


def test_parity_with_independent_replication(spark):
    strengths = {0: 1, 1: 2, 2: 4, 3: 8}
    out = _outcomes(strengths)
    got = {
        r["item"]: (r["rating"], r["wins"])
        for r in bt_ratings(_df(spark, out), iterations=8).collect()
    }
    exp_p, exp_w = _py_bt(out, iterations=8)
    assert {k: v[0] for k, v in got.items()} == exp_p
    assert {k: v[1] for k, v in got.items()} == exp_w
    # ratings recover the strength ordering
    ranked = sorted(got, key=lambda v: got[v][0])
    assert ranked == [0, 1, 2, 3]


def test_all_losing_item_clamped_not_zero(spark):
    # item 9 never wins: raw update floors to 0 -> clamp keeps it >= 1
    out = [(1, 9), (2, 9), (1, 9), (2, 1), (1, 2)]
    got = {
        r["item"]: r["rating"]
        for r in bt_ratings(_df(spark, out), iterations=6).collect()
    }
    exp_p, _ = _py_bt(out, iterations=6)
    assert got == exp_p
    assert got[9] >= 0
    assert got[9] < got[1] and got[9] < got[2]


def test_partitioning_invariance(spark):
    out = _outcomes({0: 1, 1: 3, 2: 5}, rounds=30)
    df = _df(spark, out)
    r1 = bt_ratings(df.repartition(1), iterations=5)
    r9 = bt_ratings(df.repartition(9), iterations=5)
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r9.collect()))


def test_draws_self_pairs_excluded(spark):
    out = [(1, 1), (1, 2), (2, 1)]
    rows = bt_pair_counts(_df(spark, out)).collect()
    assert len(rows) == 1 and rows[0]["n"] == 2


# ---------------------------------------------------------------------------
# group_advantages (GRPO / RLOO)


def _adv_df(spark, rows):
    from napalm_logs_spark.operators.ranking import group_advantages

    df = spark.createDataFrame(rows, "prompt_id long, rollout_id long, reward long")
    return group_advantages(df)


def test_group_advantages_hand_computed(spark):
    # group 1: rewards [1, 2, 3, 6] -> n=4, sum=12, sum2=50
    # var_num = 4*50 - 144 = 56; for r=6: adv_num = 24-12 = 12,
    # grpo = 12/sqrt(56), rloo = 12/3 = 4.
    rows = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 6)]
    got = {r["rollout_id"]: r for r in _adv_df(spark, rows).collect()}
    assert got[13]["n"] == 4
    assert got[13]["adv_num"] == 12
    assert got[13]["var_num"] == 56
    assert got[13]["grpo_adv"] == 12.0 / (56.0 ** 0.5)
    assert got[13]["rloo_adv"] == 4.0
    assert not got[13]["degenerate"]
    # mean-reward rollout: centered numerator for r=3 is 4*3-12 = 0
    assert got[12]["adv_num"] == 0 and got[12]["grpo_adv"] == 0.0
    # advantages sum to zero within the group (exact integers)
    assert sum(g["adv_num"] for g in got.values()) == 0


def test_group_advantages_degenerate_and_singleton(spark):
    rows = [(1, 1, 5), (1, 2, 5), (1, 3, 5), (2, 4, 7)]
    got = {r["rollout_id"]: r for r in _adv_df(spark, rows).collect()}
    # all-equal group: zero variance -> NULL grpo, flagged, RLOO still 0
    assert got[1]["degenerate"] and got[1]["grpo_adv"] is None
    assert got[1]["rloo_adv"] == 0.0
    # singleton group: both advantages NULL, degenerate
    assert got[4]["n"] == 1
    assert got[4]["grpo_adv"] is None and got[4]["rloo_adv"] is None
    assert got[4]["degenerate"]


def test_group_advantages_parity_with_replication(spark):
    import hashlib
    import math

    rows = []
    for i in range(400):
        h = int(hashlib.md5(f"adv:{i}".encode()).hexdigest()[:8], 16)
        rows.append((i // 8, i, h % 1000 - 500))
    got = {r["rollout_id"]: r for r in _adv_df(spark, rows).collect()}
    by_group = {}
    for g, i, r in rows:
        by_group.setdefault(g, []).append((i, r))
    for g, members in by_group.items():
        n = len(members)
        s = sum(r for _, r in members)
        s2 = sum(r * r for _, r in members)
        var_num = n * s2 - s * s
        for i, r in members:
            adv = n * r - s
            row = got[i]
            assert row["adv_num"] == adv and row["var_num"] == var_num
            if var_num > 0:
                assert row["grpo_adv"] == float(adv) / math.sqrt(float(var_num))
            assert row["rloo_adv"] == float(adv) / float(n - 1)


def test_group_advantages_partitioning_invariance(spark):
    rows = [(i % 7, i, (i * 37) % 23 - 11) for i in range(200)]
    df = spark.createDataFrame(rows, "prompt_id long, rollout_id long, reward long")
    from napalm_logs_spark.operators.ranking import group_advantages

    a = sorted(map(tuple, group_advantages(df.repartition(1)).collect()))
    b = sorted(map(tuple, group_advantages(df.repartition(13)).collect()))
    assert a == b


def test_group_advantages_single_exchange_plan(spark):
    rows = [(1, 1, 2), (1, 2, 4)]
    df = spark.createDataFrame(rows, "prompt_id long, rollout_id long, reward long")
    from napalm_logs_spark.operators.ranking import group_advantages

    plan = group_advantages(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# reward_length_bias (length-hacking gauge)


def _bias_df(spark, rows):
    from napalm_logs_spark.operators.ranking import reward_length_bias

    df = spark.createDataFrame(rows, "prompt_id long, n_chars long, reward long")
    return reward_length_bias(df)


def test_reward_length_bias_hand_computed(spark):
    import math

    # perfectly linear y = 2x -> r = 1 up to the documented IEEE chain
    # (sqrt(6)*sqrt(24) = 11.999999999999998, so r is 1 + 1ulp — the
    # contract is cross-engine bit-identity of the chain, not algebra)
    rows = [(1, 1, 2), (1, 2, 4), (1, 3, 6)]
    g = _bias_df(spark, rows).collect()[0]
    assert (g["num"], g["denx"], g["deny"]) == (12, 6, 24)
    assert g["pearson_r"] == 12.0 / (math.sqrt(6.0) * math.sqrt(24.0))
    assert abs(g["pearson_r"] - 1.0) < 1e-12
    # perfectly anti-linear -> r = -1 via the same chain
    rows = [(1, 1, 6), (1, 2, 4), (1, 3, 2)]
    g = _bias_df(spark, rows).collect()[0]
    assert g["pearson_r"] == -12.0 / (math.sqrt(6.0) * math.sqrt(24.0))


def test_reward_length_bias_degenerate(spark):
    # constant reward: deny = 0 -> undefined correlation
    rows = [(1, 1, 5), (1, 2, 5), (1, 3, 5)]
    g = _bias_df(spark, rows).collect()[0]
    assert g["deny"] == 0 and g["pearson_r"] is None
    # singleton group: both variances 0
    g = _bias_df(spark, [(2, 7, 3)]).collect()[0]
    assert g["n"] == 1 and g["pearson_r"] is None


def test_reward_length_bias_parity_and_invariance(spark):
    import math

    rows = [(i // 16, (i * 13) % 97 + 1, (i * 37) % 53 - 26) for i in range(320)]
    df = spark.createDataFrame(rows, "prompt_id long, n_chars long, reward long")
    from napalm_logs_spark.operators.ranking import reward_length_bias

    got = {r["prompt_id"]: r for r in reward_length_bias(df).collect()}
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, m in by_g.items():
        n = len(m)
        sx, sy = sum(x for x, _ in m), sum(y for _, y in m)
        sxy = sum(x * y for x, y in m)
        sxx, syy = sum(x * x for x, _ in m), sum(y * y for _, y in m)
        num, denx, deny = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        row = got[g]
        assert (row["num"], row["denx"], row["deny"]) == (num, denx, deny)
        if denx > 0 and deny > 0:
            want = float(num) / (math.sqrt(float(denx)) * math.sqrt(float(deny)))
            assert row["pearson_r"] == want
    a = sorted(map(tuple, reward_length_bias(df.repartition(1)).collect()))
    b = sorted(map(tuple, reward_length_bias(df.repartition(9)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# fleiss_kappa (inter-annotator agreement)


def _kappa_df(spark, rows, raters):
    from napalm_logs_spark.operators.ranking import fleiss_kappa

    df = spark.createDataFrame(rows, "item_id long, category string")
    return fleiss_kappa(df, raters=raters)


def _py_fleiss(rows, raters):
    from collections import Counter, defaultdict

    per_item = defaultdict(Counter)
    for i, c in rows:
        per_item[i][c] += 1
    ok = {i: cnt for i, cnt in per_item.items() if sum(cnt.values()) == raters}
    N = len(ok)
    if N == 0:
        return None
    po_num = sum(v * (v - 1) for cnt in ok.values() for v in cnt.values())
    po_den = N * raters * (raters - 1)
    t = Counter()
    for cnt in ok.values():
        t.update(cnt)
    s = sum(v * v for v in t.values())
    nn2 = (N * raters) ** 2
    po, pe = po_num / po_den, s / nn2
    kappa = None if pe == 1.0 else (po - pe) / (1.0 - pe)
    return dict(n_items=N, po_num=po_num, po_den=po_den, s=s, nn2=nn2,
                po=po, pe=pe, kappa=kappa)


def test_fleiss_kappa_perfect_and_chance(spark):
    # 4 items, 3 raters, unanimous but SPLIT across categories -> kappa 1
    rows = [(i, "a" if i % 2 else "b") for i in range(4) for _ in range(3)]
    g = _kappa_df(spark, rows, raters=3).collect()[0]
    assert g["po_num"] == 4 * 6 and g["kappa"] == 1.0
    # all raters in one category on every item: pe = 1 -> undefined
    rows = [(i, "a") for i in range(4) for _ in range(3)]
    g = _kappa_df(spark, rows, raters=3).collect()[0]
    assert g["pe"] == 1.0 and g["kappa"] is None


def test_fleiss_kappa_drops_unbalanced_items(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"),       # qualified
            (2, "a"), (2, "b"),                 # only 2 ratings -> dropped
            (3, "a"), (3, "a"), (3, "a"), (3, "a")]  # 4 ratings -> dropped
    g = _kappa_df(spark, rows, raters=3).collect()[0]
    assert g["n_items"] == 1 and g["n_items_dropped"] == 2
    want = _py_fleiss(rows, 3)
    assert g["po_num"] == want["po_num"] and g["s"] == want["s"]
    # dropped items must not leak into category totals
    assert g["s"] == 2 * 2 + 1 * 1


def test_fleiss_kappa_parity_and_empty(spark):
    import hashlib

    rows = []
    for i in range(60):
        for rtr in range(4):
            h = int(hashlib.md5(f"fk:{i}:{rtr}".encode()).hexdigest()[:4], 16)
            rows.append((i, "cat" + str(h % 3)))
    g = _kappa_df(spark, rows, raters=4).collect()[0]
    want = _py_fleiss(rows, 4)
    for k in ("n_items", "po_num", "po_den", "s", "nn2"):
        assert g[k] == want[k], k
    assert g["po"] == want["po"] and g["pe"] == want["pe"]
    assert abs(g["kappa"] - want["kappa"]) < 1e-15
    # every item dropped: stats NULL, not NaN
    g = _kappa_df(spark, [(1, "a"), (2, "b")], raters=3).collect()[0]
    assert g["n_items"] == 0 and g["kappa"] is None and g["po"] is None
