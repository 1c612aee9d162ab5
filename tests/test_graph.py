"""Weighted integer PageRank: pinned against a pure-Python replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_to_parquet_spark.functions.graph import PR_SCALE, pagerank


def _pagerank_py(edges, iterations, scale=PR_SCALE):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    w_out = {}
    for s, _, w in edges:
        w_out[s] = w_out.get(s, 0) + w
    rank = {v: scale // n for v in nodes}
    for _ in range(iterations):
        base = 15 * scale // (100 * n)
        nxt = {v: base for v in nodes}
        for s, d, w in edges:
            nxt[d] += 85 * rank[s] * w // (100 * w_out[s])
        rank = nxt
    return rank


def test_pagerank_matches_python_replay(spark):
    edges = [
        ("a", "b", 3),
        ("a", "c", 1),
        ("b", "c", 2),
        ("c", "a", 5),
        ("d", "a", 1),  # d is dangling-in only as a source
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    want = _pagerank_py(edges, iterations=3)
    assert got == want
    # the hub everything links to must out-rank the leaf with one weak
    # inbound edge
    assert got["a"] > got["b"] > got["d"]
    # dangling mass is dropped, never duplicated: total stays <= scale
    assert sum(got.values()) <= PR_SCALE


def test_pagerank_partition_invariant(spark):
    edges = [
        (f"n{i}", f"n{(i * 7 + 3) % 20}", (i % 5) + 1) for i in range(60)
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    a = sorted(
        tuple(r) for r in pagerank(df.repartition(1), iterations=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in pagerank(df.repartition(5, "dst"), iterations=2).collect()
    )
    assert a == b


def test_pagerank_uniform_cycle_stays_uniform(spark):
    # a weight-1 ring: symmetry means every round returns the same rank
    ring = [(f"v{i}", f"v{(i + 1) % 6}", 1) for i in range(6)]
    df = spark.createDataFrame(ring, ["src", "dst", "weight"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}
    assert len(set(got.values())) == 1


def test_pagerank_checkpoint_cadence_identical(spark):
    edges = [
        (f"n{i}", f"n{(i * 3 + 1) % 12}", (i % 4) + 1) for i in range(30)
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    a = sorted(
        tuple(r)
        for r in pagerank(df, iterations=6, checkpoint_every=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in pagerank(df, iterations=6, checkpoint_every=100).collect()
    )
    assert a == b


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangles_known_graph(spark):
    from xml_to_parquet_spark.functions.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 4-5
    # and an isolated edge 6-7 (no triangles).
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _edges(spark, k4 + [(4, 5), (6, 7)])
    out = {r.node: r for r in triangle_counts(e).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(out[n].triangles == 3 for n in (1, 2, 3))
    assert out[4].triangles == 3 and out[4].degree == 4
    assert out[1].degree == 3


def test_triangles_direction_and_duplicate_invariant(spark):
    from xml_to_parquet_spark.functions.graph import triangle_counts

    tri = [(1, 2), (2, 3), (1, 3)]
    flipped = [(b, a) for a, b in tri]
    with_dups = tri + flipped + tri + [(2, 2)]  # self-loop dropped too
    res = [
        sorted(
            (r.node, r.degree, r.triangles)
            for r in triangle_counts(_edges(spark, p)).collect()
        )
        for p in (tri, flipped, with_dups)
    ]
    assert res[0] == res[1] == res[2] == [(1, 2, 1), (2, 2, 1), (3, 2, 1)]


def test_triangles_python_replay_and_partition_invariant(spark):
    from itertools import combinations

    from xml_to_parquet_spark.functions.graph import triangle_counts

    # deterministic pseudo-random graph, replayed by brute force
    pairs = sorted(
        {
            (a, b)
            for a, b in combinations(range(24), 2)
            if (a * 31 + b * 17) % 5 < 2
        }
    )
    adj = {n: set() for n in range(24)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for x, y, z in combinations(range(24), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    for parts in (1, 7):
        e = _edges(spark, pairs).repartition(parts)
        got = {
            r.node: r.triangles
            for r in triangle_counts(e, top_k=100).collect()
        }
        assert got == want and len(want) > 5


def test_bfs_levels_known_graph(spark):
    from xml_to_parquet_spark.functions.graph import bfs_levels

    # path 1-2-3-4-5 plus a branch 2-10: from seed 1,
    # hop1={2}, hop2={3,10}, hop3={4}
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (2, 10)])
    out = {(r.seed, r.hop): r.n_nodes for r in bfs_levels(e, [1, 5]).collect()}
    assert out[(1, 1)] == 1 and out[(1, 2)] == 2 and out[(1, 3)] == 1
    # from seed 5: hop1={4}, hop2={3}, hop3={2}
    assert out[(5, 1)] == 1 and out[(5, 2)] == 1 and out[(5, 3)] == 1
    # visited set: node 1 must not be re-counted from seed 1 via cycles
    assert len(out) == 6


def test_bfs_levels_exhausted_frontier_and_directed(spark):
    from xml_to_parquet_spark.functions.graph import bfs_levels

    e = _edges(spark, [(1, 2), (2, 1)])  # 2-cycle
    und = {
        (r.seed, r.hop): r.n_nodes
        for r in bfs_levels(e, [1], max_hops=3).collect()
    }
    # hop1 reaches 2, then the frontier is exhausted: no hop2/hop3 rows
    assert und == {(1, 1): 1}
    # directed mode on a one-way edge: seed 2 reaches nothing
    d = bfs_levels(_edges(spark, [(1, 2)]), [2], undirected=False).collect()
    assert d == []


def test_k_core_known_graph(spark):
    from xml_to_parquet_spark.functions.graph import k_core

    # K4 on {0,1,2,3} (a true 3-core) + a pendant chain 3-4-5 and a
    # triangle {6,7,8} (2-core only) — peeling must keep exactly the K4
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(3, 4), (4, 5), (6, 7), (7, 8), (6, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = k_core(df, k=3, rounds=5).collect()
    assert {r.node for r in out} == {0, 1, 2, 3}
    assert all(r.deg == 3 for r in out)
    assert all(r.converged == 1 for r in out)


def test_k_core_not_converged_flag(spark):
    from xml_to_parquet_spark.functions.graph import k_core

    # a long chain peels one node per round from each end: 1 round on a
    # k=2 chain of 8 nodes cannot reach the (empty) 2-core -> flag 0
    chain = [(i, i + 1) for i in range(7)]
    df = spark.createDataFrame(chain, "src long, dst long")
    early = k_core(df, k=2, rounds=1).collect()
    assert early and all(r.converged == 0 for r in early)
    late = k_core(df, k=2, rounds=4).collect()
    assert late == []  # chain has no 2-core; empty result IS converged


def test_k_core_matches_duckdb_oracle(spark):
    import duckdb

    from xml_to_parquet_spark.functions.graph import k_core, k_core_sql

    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [
        (3, 4), (4, 5), (0, 9), (9, 10), (10, 0), (5, 6), (6, 3),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [tuple(r) for r in k_core(df, k=2, rounds=4).collect()]
    rows = ", ".join(f"({a}, {b})" for a, b in edges)
    want = [
        tuple(r)
        for r in duckdb.sql(
            k_core_sql(
                f"SELECT * FROM (VALUES {rows}) t(src, dst)", k=2, rounds=4
            )
        ).fetchall()
    ]
    assert got == want and got


def test_k_core_partition_invariant(spark):
    from xml_to_parquet_spark.functions.graph import k_core
    from xml_to_parquet_spark.workload import _coorder_edges

    e = _coorder_edges(spark, "/root/testdata/sf0.001")
    a = [tuple(r) for r in k_core(e.repartition(1), k=3, rounds=3).collect()]
    b = [tuple(r) for r in k_core(e.repartition(7), k=3, rounds=3).collect()]
    assert a == b and a


def test_k_core_rejects_zero_rounds(spark):
    """r9 ADVICE: rounds=0 used to crash with AttributeError (prev_nodes
    never assigned) deep in the convergence count — both the plan and
    its oracle twin must refuse it loudly at the boundary instead."""
    import pytest as _pytest

    from xml_to_parquet_spark.functions.graph import k_core, k_core_sql

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with _pytest.raises(ValueError, match="rounds >= 1"):
        k_core(df, k=2, rounds=0)
    with _pytest.raises(ValueError, match="rounds >= 1"):
        k_core_sql("SELECT 0 AS src, 1 AS dst", k=2, rounds=0)
