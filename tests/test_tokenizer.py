"""Real-BPE tokenizer tests (r6): general merge loop, broadcast-batched
counting stage, and the SQL-replay equivalence contract."""

from __future__ import annotations

import random

import pytest

from xml_to_parquet_spark.functions.tokenizer import (
    TOY_MERGES,
    bpe_replay_sql,
    bpe_segment,
    bpe_token_counts,
)


def _ranks(merges):
    return {pair: i for i, pair in enumerate(merges)}


def test_bpe_segment_cascading_merges():
    """The kernel is GENERAL BPE: outputs feed later merges."""
    merges = [("t", "h"), ("th", "e")]
    assert bpe_segment("the", _ranks(merges)) == ["the"]
    assert bpe_segment("then", _ranks(merges)) == ["the", "n"]
    assert bpe_segment("that", _ranks(merges)) == ["th", "a", "t"]


def test_bpe_segment_rank_priority():
    # 'in' outranks 'th': 'thin' must merge 'in' first, then 'th'
    merges = [("i", "n"), ("t", "h")]
    assert bpe_segment("thin", _ranks(merges)) == ["th", "in"]
    # all occurrences of the winning pair merge in one pass
    assert bpe_segment("inin", _ranks(merges)) == ["in", "in"]


def test_bpe_segment_no_merges():
    assert bpe_segment("xyz", {}) == ["x", "y", "z"]
    assert bpe_segment("", {}) == []


def test_bpe_token_counts_stage(spark):
    df = spark.createDataFrame(
        [(1, "The THIN   thread", "a"), (2, "on and on", "b")],
        "doc_id long, text string, src string",
    )
    rows = {
        r.doc_id: r
        for r in bpe_token_counts(df, keep_cols=("src",)).collect()
    }
    # doc1 normalized: "the thin thread"; toy merges: th+e->2? 'the' ->
    # [th,e]=2, 'thin'(t,h,i,n: th then in)->[th,in]=2,
    # 'thread'(t,h,r,e,a,d: th, er? pairs after th: (th,r)(r,e)(e,a)(a,d);
    # 're'? not a pair; ('e','r') is. so [th,r,e,a,d]=5
    assert (rows[1].ws_tokens, rows[1].bpe_tokens) == (3, 2 + 2 + 5)
    # doc2: 'on'->1, 'and'->[an,d]=2, 'on'->1
    assert (rows[2].ws_tokens, rows[2].bpe_tokens) == (3, 4)
    assert rows[1].src == "a" and rows[2].src == "b"


def test_bpe_replay_sql_rejects_out_of_contract_vocabs():
    norm = "lower(text)"
    with pytest.raises(ValueError):
        bpe_replay_sql(norm, (("t", "h"), ("th", "e")))  # cascade
    with pytest.raises(ValueError):
        bpe_replay_sql(norm, (("a", "a"),))  # self-overlap
    with pytest.raises(ValueError):
        bpe_replay_sql(norm, (("a", "b"), ("a", "b")))  # duplicate
    with pytest.raises(ValueError):
        bpe_replay_sql(norm, (("A", "b"),))  # not lowercase


def test_bpe_kernel_equals_sql_replay_randomized():
    """Property: for the toy (constraint-satisfying) vocabulary the kernel
    count equals the DuckDB sequential-replacement replay on random text
    over the pair alphabet — the exact-oracle contract."""
    import duckdb

    rng = random.Random(7)
    letters = "theranisol"
    texts = [
        " ".join(
            "".join(rng.choice(letters) for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(300)
    ]
    ranks = _ranks(TOY_MERGES)
    kernel = [
        sum(len(bpe_segment(w, ranks)) for w in t.split())
        for t in texts
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{s}')" for i, s in enumerate(texts))
        + ") v(i, text)"
    )
    expr = bpe_replay_sql(
        "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    )
    sql = [r[0] for r in con.execute(
        f"SELECT {expr} FROM t ORDER BY i"
    ).fetchall()]
    assert kernel == sql


def test_bpe_learn_merges_known_corpus(spark):
    # hand-checkable corpus: "ab" dominates, then the learned "ab" symbol
    # itself pairs with "c" — a cascading merge the trainer must find
    rows = [(i, "abc abc abc abd ab") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from xml_to_parquet_spark.functions.tokenizer import bpe_learn_merges

    merges = bpe_learn_merges(df, num_merges=3)
    assert merges[0][:2] == ("a", "b")  # 20 occurrences
    assert merges[0][2] == 20
    assert merges[1][:2] == ("ab", "c")  # cascade onto the round-1 output
    assert merges[1][2] == 12
    assert merges[2][:2] == ("ab", "d")


def test_bpe_learn_merges_matches_duckdb_replay(spark):
    import duckdb

    from xml_to_parquet_spark.functions.tokenizer import (
        bpe_learn_merges,
        bpe_learn_sql,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [
        (i, l, r, c)
        for i, (l, r, c) in enumerate(bpe_learn_merges(df, num_merges=6))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(bpe_learn_sql(6)).fetchall()]
    assert got == want and len(got) == 6


def test_bpe_learn_merges_partition_invariant(spark):
    from xml_to_parquet_spark.functions.tokenizer import bpe_learn_merges

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = bpe_learn_merges(df.repartition(1), num_merges=4)
    b = bpe_learn_merges(df.repartition(9), num_merges=4)
    assert a == b


def test_bpe_learned_table_feeds_token_counts(spark):
    # the learned-table path plugs into a43's counting stage unchanged
    # and strictly compresses vs the unmerged baseline
    from xml_to_parquet_spark.functions.tokenizer import (
        bpe_learn_merges,
        bpe_token_counts,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    learned = tuple(
        (l, r) for l, r, _ in bpe_learn_merges(df, num_merges=8)
    )
    counted = bpe_token_counts(df, merges=learned).collect()
    assert len(counted) == df.count()
    base = {
        r.doc_id: r.bpe_tokens
        for r in bpe_token_counts(df, merges=()).collect()
    }
    assert all(r.bpe_tokens <= base[r.doc_id] for r in counted)
    assert sum(r.bpe_tokens for r in counted) < sum(base.values())
