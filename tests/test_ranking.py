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
