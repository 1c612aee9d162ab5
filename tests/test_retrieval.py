"""BM25 retrieval: ilog2 fixed-point pinning + independent score replay.

Cross-engine oracle equality is covered by tools/verify_local.py
(a33_bm25_topk); here the integer kernels are pinned against pure-Python
references and the ranking properties that make the operator usable.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from xml_to_parquet_spark.functions.retrieval import (
    BM25_SCALE,
    IDF_PRESHIFT,
    bm25_topk,
    ilog2_1024_py,
    ilog2_1024_spark,
)


def test_ilog2_spark_matches_python_reference(spark):
    xs = (
        list(range(1, 300))
        + [2**i for i in range(1, 53)]
        + [2**i - 1 for i in range(2, 53)]
        + [1234567, 987654321, (1 << 52) + 12345]
    )
    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    rows = df.select(
        "v", F.expr(ilog2_1024_spark("v")).alias("l")
    ).collect()
    for r in rows:
        assert r["l"] == ilog2_1024_py(r["v"]), r["v"]


def test_ilog2_monotone_and_bounded_error():
    prev = None
    for x in range(1, 5000):
        got = ilog2_1024_py(x)
        if prev is not None:
            assert got >= prev  # monotone (strict on distinct mantissas)
        prev = got
        err = abs(got / 1024 - math.log2(x))
        assert err <= 0.09  # published linear-mantissa bound ~0.086 bits


def _bm25_py(docs: dict[int, list[str]], terms: list[str], k: int):
    """Independent integer replay of the documented arithmetic."""
    dl = {d: len(t) for d, t in docs.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) // n_docs
    scores = {}
    hits = {}
    for term in terms:
        tfs = {d: t.count(term) for d, t in docs.items() if term in t}
        if not tfs:
            continue
        df = len(tfs)
        ratio = ((2 * n_docs + 2) << IDF_PRESHIFT) // (2 * df + 1)
        idf = ilog2_1024_py(ratio) - IDF_PRESHIFT * 1024
        for d, tf in tfs.items():
            tfn = (88 * tf * avgdl * BM25_SCALE) // (
                40 * tf * avgdl + 12 * avgdl + 36 * dl[d]
            )
            scores[d] = scores.get(d, 0) + idf * tfn
            hits[d] = hits.get(d, 0) + 1
    order = sorted(scores, key=lambda d: (-scores[d], d))[:k]
    return [(d, scores[d], hits[d]) for d in order]


def test_bm25_matches_independent_replay(spark):
    corpus = {
        1: "cat dog cat bird",
        2: "cat cat cat cat dog dog",
        3: "bird bird fish",
        4: "dog",
        5: "fish cat",
        6: "lizard stone stone stone stone stone stone stone stone",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], ["doc_id", "text"]
    )
    terms = ["cat", "dog", "absent"]
    got = [
        (r["doc_id"], r["bm25_fp"], r["n_terms_hit"])
        for r in bm25_topk(docs, terms, k=4).collect()
    ]
    want = _bm25_py(
        {i: t.split() for i, t in corpus.items()}, terms, k=4
    )
    assert got == want
    # rarer term ('dog' appears in fewer docs than 'cat') must out-idf;
    # doc 4 is pure-dog and short, so it should beat the pure-cat doc 2
    # on the per-term score despite lower tf when lengths equalize —
    # sanity: every returned score is positive and ordered
    assert all(s > 0 for _, s, _ in got)
    assert [s for _, s, _ in got] == sorted(
        (s for _, s, _ in got), reverse=True
    )


def test_bm25_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["hash", "join"]
    a = bm25_topk(docs.repartition(1), terms, k=10).collect()
    b = bm25_topk(docs.repartition(7, "lang"), terms, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_phrase_query_known_matches(spark):
    from xml_to_parquet_spark.functions.retrieval import (
        phrase_query,
        positional_postings,
    )

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat stood on the mat"),      # no "cat sat"
        (3, "cat sat cat sat on the cat sat"),  # 3 matches, overlapping ok
        (4, "SAT the CAT sat"),               # normalization lowercases
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = positional_postings(df)
    out = {
        r.id: (r.n_matches, r.first_pos)
        for r in phrase_query(idx, ["cat", "sat"]).collect()
    }
    assert out == {1: (1, 1), 3: (3, 0), 4: (1, 2)}
    # single-word phrase degenerates to token occurrence counts
    one = {
        r.id: r.n_matches
        for r in phrase_query(idx, ["the"]).collect()
    }
    assert one == {1: 2, 2: 2, 3: 1, 4: 1}
    # absent phrase -> empty
    assert phrase_query(idx, ["cat", "flew"]).count() == 0
    import pytest

    with pytest.raises(ValueError):
        phrase_query(idx, [])


def test_positional_postings_positions(spark):
    from xml_to_parquet_spark.functions.retrieval import (
        positional_postings,
    )

    df = spark.createDataFrame(
        [(9, "  a  b a ")], "doc_id long, text string"
    )
    got = sorted(
        (r.token, r.pos)
        for r in positional_postings(df).collect()
    )
    assert got == [("a", 0), ("a", 2), ("b", 1)]


def test_near_query_known_matches(spark):
    from xml_to_parquet_spark.functions.retrieval import (
        near_query,
        positional_postings,
    )

    docs = [
        (1, "alpha x x beta"),        # gap 3
        (2, "alpha x x x beta"),      # gap 4 > slop
        (3, "beta alpha"),            # reversed order, gap 1
        (4, "alpha beta alpha"),      # two pairs, min gap 1
        (5, "alpha alpha"),           # w2 absent
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = positional_postings(df)
    out = {
        r.id: (r.n_pairs, r.min_gap)
        for r in near_query(idx, "alpha", "beta", slop=3).collect()
    }
    assert out == {1: (1, 3), 3: (1, 1), 4: (2, 1)}
    # same-word proximity: repeated occurrences pair, self-pairs don't
    same = {
        r.id: (r.n_pairs, r.min_gap)
        for r in near_query(idx, "alpha", "alpha", slop=3).collect()
    }
    assert same[5] == (2, 1)     # (0,1) and (1,0)
    assert same[4] == (2, 2)     # positions 0 and 2, both directions
    import pytest

    with pytest.raises(ValueError):
        near_query(idx, "a", "b", slop=0)


def test_more_like_this_known_ranking(spark):
    from xml_to_parquet_spark.functions.retrieval import more_like_this

    # doc 0 shares the rare token "zebra" (df=2) with doc 1 only, and
    # the common token "the" (df=4) with everyone: doc 1 must rank
    # first on the idf weighting. doc 3 shares nothing -> absent.
    docs = [
        (0, "the zebra runs"),
        (1, "the zebra sleeps"),
        (2, "the fox sleeps"),
        (3, "quiet empty prose"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = [
        (r.neighbor_id, r.rank)
        for r in more_like_this(
            df, query_ids=[0], k=3, max_df_ppm=1_000_000
        ).collect()
    ]
    assert out[0] == (1, 1)
    assert {n for n, _ in out} == {1, 2}
    # stopword prune: at 50% the everywhere-token "the" drops, leaving
    # only the zebra link
    pruned = [
        (r.neighbor_id, r.rank)
        for r in more_like_this(
            df, query_ids=[0], k=3, max_df_ppm=500_000
        ).collect()
    ]
    assert pruned == [(1, 1)]


def test_more_like_this_symmetry_and_determinism(spark):
    from xml_to_parquet_spark.functions.retrieval import more_like_this

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = more_like_this(
        docs, query_ids=[0, 1], k=4, max_df_ppm=850_000
    ).collect()
    b = more_like_this(
        docs.repartition(7), query_ids=[0, 1], k=4, max_df_ppm=850_000
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 8


def test_rrf_fuse_hand_computed(spark):
    from xml_to_parquet_spark.functions.retrieval import RRF_SCALE, rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rrf_ppb"], r["n_channels"], r["fused_rank"])
        for r in rrf_fuse([lex, sem], k_const=60, k=10).collect()
    }
    c = lambda r: RRF_SCALE // (60 + r)
    # doc 10: ranks 1+3; doc 20: 2+1; doc 30: 3 only; doc 40: 2 only
    exp = {
        10: c(1) + c(3), 20: c(2) + c(1), 30: c(3), 40: c(2),
    }
    assert {d: v[0] for d, v in got.items()} == exp
    assert got[10][1] == 2 and got[30][1] == 1
    # doc 20 (16129032+16393442) beats doc 10 (16393442+15873015)
    order = sorted(got, key=lambda d: got[d][2])
    assert order == [20, 10, 40, 30]


def test_rrf_fuse_single_channel_and_guards(spark):
    import pytest as _pytest

    from xml_to_parquet_spark.functions.retrieval import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    rows = rrf_fuse([lex], k=1).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with _pytest.raises(ValueError, match="k_const"):
        rrf_fuse([lex], k_const=0)
