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
