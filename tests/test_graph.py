"""PageRank semantics (operators/graph.py): exact parity with an
independent pure-python replication of the integer recurrence,
dangling-mass redistribution, partitioning invariance, mass bounds."""

from pyspark.sql import functions as F

from napalm_logs_spark.operators.graph import SCALE, pagerank, synth_link_graph


def _py_pagerank(edges, nodes, iterations=10, num=85, den=100, scale=SCALE):
    """Independent replication: dict-based, same all-integer recurrence."""
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    base = scale // n
    tp = ((den - num) * base) // den
    rank = {v: base for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // out[s]
        dang = sum(rank[v] for v in nodes if v not in out)
        share = dang // n
        rank = {v: tp + (num * (contrib[v] + share)) // den for v in nodes}
    return rank


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_parity_with_independent_replication(spark):
    # ring + hub + dangling node: 0..4 point at 0, 0 points at 1, 3 dangles
    edges = [(0, 1), (1, 0), (2, 0), (4, 0), (4, 2), (1, 2)]
    nodes = [0, 1, 2, 3, 4]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, edges), ndf, iterations=10).collect()
    }
    exp = _py_pagerank(edges, nodes)
    assert got == exp
    # the hub out-ranks the dangling leaf
    assert got[0] > got[3]


def test_dangling_mass_redistributes(spark):
    # 0->1, 1 dangles: without redistribution node 0 would starve to
    # the teleport floor while 1 keeps none of its inflow either
    edges = [(0, 1)]
    ndf = spark.createDataFrame([(0,), (1,)], "node long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, edges), ndf, iterations=5).collect()
    }
    exp = _py_pagerank([(0, 1)], [0, 1], iterations=5)
    assert got == exp
    assert got[0] > ((100 - 85) * (SCALE // 2)) // 100  # above bare teleport


def test_mass_conserved_within_floor_loss(spark):
    docs = spark.range(60).withColumnRenamed("id", "doc_id")
    edges = synth_link_graph(docs, 60)
    nodes = docs.withColumnRenamed("doc_id", "node")
    ranks = pagerank(edges, nodes, iterations=10)
    total = sum(r["rank"] for r in ranks.collect())
    # each iteration loses < (#sends + n + 2) integer remainders
    assert SCALE * 0.999 <= total <= SCALE


def test_partitioning_invariance(spark):
    docs = spark.range(80).withColumnRenamed("id", "doc_id")
    nodes = docs.withColumnRenamed("doc_id", "node")
    e = synth_link_graph(docs, 80)
    r1 = pagerank(e.repartition(1), nodes.repartition(1), iterations=6)
    r9 = pagerank(e.repartition(9), nodes.repartition(9), iterations=6)
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r9.collect()))


def test_default_nodes_from_edges(spark):
    got = pagerank(_edges_df(spark, [(7, 9), (9, 7)]), iterations=3).collect()
    assert sorted(r["node"] for r in got) == [7, 9]
    # symmetric 2-cycle: equal ranks
    assert len({r["rank"] for r in got}) == 1


# ---- triangle_counts ------------------------------------------------

from napalm_logs_spark.operators.graph import triangle_counts


def _py_triangles(edges):
    """Independent replication: brute-force triangle enumeration."""
    es = set()
    for s, d in edges:
        if s != d:
            es.add((min(s, d), max(s, d)))
    adj = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tris = set()
    for u, v in es:
        for w in adj[u] & adj[v]:
            tris.add(tuple(sorted((u, v, w))))
    out = {v: [len(adj[v]), 0] for v in adj}
    for t in tris:
        for v in t:
            out[v][1] += 1
    return out


def test_triangles_parity_with_bruteforce(spark):
    # two overlapping triangles + a pendant + an isolated edge
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3), (3, 4), (8, 9),
             (1, 0)]  # duplicate/reversed edge must not double-count
    got = {
        r["node"]: (r["deg"], r["triangles"], r["lcc"])
        for r in triangle_counts(_edges_df(spark, edges)).collect()
    }
    exp = _py_triangles(edges)
    assert set(got) == set(exp)
    for v, (d, t) in exp.items():
        assert got[v][0] == d and got[v][1] == t, (v, got[v], (d, t))
        if d >= 2:
            assert got[v][2] == 2.0 * t / (d * (d - 1))
        else:
            assert got[v][2] is None


def test_triangles_self_loop_ignored(spark):
    got = triangle_counts(_edges_df(spark, [(5, 5), (0, 1), (1, 2), (2, 0)]))
    rows = {r["node"]: r["triangles"] for r in got.collect()}
    assert rows == {0: 1, 1: 1, 2: 1}


def test_triangles_partitioning_invariance(spark):
    docs = spark.range(90).withColumnRenamed("id", "doc_id")
    base = synth_link_graph(docs, 90)
    i = F.col("doc_id").cast("long")
    planted = (
        docs.filter(i % 5 == 0)
        .select(
            F.explode(
                F.array(
                    F.struct(i.alias("src"), ((i + 1) % 90).alias("dst")),
                    F.struct(((i + 1) % 90).alias("src"), ((i + 2) % 90).alias("dst")),
                    F.struct(i.alias("src"), ((i + 2) % 90).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    e = base.unionAll(planted)
    r1 = triangle_counts(e.repartition(1))
    r7 = triangle_counts(e.repartition(7))
    a = sorted(map(tuple, r1.collect()))
    b = sorted(map(tuple, r7.collect()))
    assert a == b
    assert sum(r[2] for r in a) >= 18 * 3  # planted strip found
