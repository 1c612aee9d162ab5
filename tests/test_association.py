"""Token co-occurrence association mining (functions/association.py)."""

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.functions import association


def test_pmi_known_values(spark):
    # "alpha beta" always co-occur (perfect collocation); "alpha gamma"
    # co-occur in half the docs containing each; "delta" floats freely.
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta delta"),
        (2, "alpha beta gamma"),
        (3, "alpha beta delta"),
        (4, "delta gamma"),
        (5, "delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = association.pmi_pairs(df, min_df=1, min_pair_count=1, top_k=100)
    got = {(r.t1, r.t2): r for r in out.collect()}
    ab = got[("alpha", "beta")]
    # c_x=c_y=c_xy=4, n_docs=6 -> lift = 4*6/(4*4) = 1.5 -> 1_500_000 ppm
    assert (ab.c_xy, ab.c_x, ab.c_y, ab.lift_ppm) == (4, 4, 4, 1_500_000)
    ag = got[("alpha", "gamma")]
    # c_xy=2, c_x=4, c_y=3 -> 2*6*1e6 // 12 = 1_000_000 (independence)
    assert ag.lift_ppm == 1_000_000
    # perfect collocation must rank above independence
    top = out.limit(1).collect()[0]
    assert (top.t1, top.t2) == ("alpha", "beta")


def test_pmi_presence_not_frequency(spark):
    # repeating a token inside one doc must not inflate counts
    df = spark.createDataFrame(
        [(0, "x x x y"), (1, "x y y")], "doc_id long, text string"
    )
    out = association.pmi_pairs(df, min_df=1, min_pair_count=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.t1, r.t2, r.c_xy, r.c_x, r.c_y) == ("x", "y", 2, 2, 2)


def test_pmi_min_df_prunes_rare_tokens(spark):
    df = spark.createDataFrame(
        [(0, "common rare1"), (1, "common rare2"), (2, "common other"),
         (3, "common other")],
        "doc_id long, text string",
    )
    out = association.pmi_pairs(df, min_df=2, min_pair_count=1).collect()
    toks = {t for r in out for t in (r.t1, r.t2)}
    assert "rare1" not in toks and "rare2" not in toks
    assert ("common", "other") in {(r.t1, r.t2) for r in out}


def test_pmi_cap_per_doc_bounds_pairs(spark):
    # a 10-token doc capped at 3 distinct tokens -> at most C(3,2) pairs
    text = " ".join(f"t{i:02d}" for i in range(10))
    df = spark.createDataFrame([(0, text), (1, text)], "doc_id long, text string")
    out = association.pmi_pairs(
        df, min_df=1, min_pair_count=1, cap_per_doc=3, top_k=100
    ).collect()
    assert len(out) == 3  # C(3,2), lexicographically first three tokens
    toks = {t for r in out for t in (r.t1, r.t2)}
    assert toks == {"t00", "t01", "t02"}


def test_pmi_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = [
        [
            (r.t1, r.t2, r.c_xy, r.lift_ppm)
            for r in association.pmi_pairs(docs.repartition(p)).collect()
        ]
        for p in (1, 7)
    ]
    assert res[0] == res[1] and len(res[0]) > 0


def test_skipgram_known_counts(spark):
    from xml_to_parquet_spark.functions.association import (
        skipgram_cooccurrence,
    )

    docs = [
        (1, "a b a"),        # d1: (a,b)x2; d2: (a,a)x1
        (2, "a b"),          # (a,b)x1
        (3, "c"),            # single token -> nothing
        (4, None),           # NULL -> nothing
        (5, "  b   a  "),    # normalization collapses spaces -> (a,b)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.t1, r.t2): r.n
        for r in skipgram_cooccurrence(
            df, window=2, min_count=1, top_k=100
        ).collect()
    }
    assert out == {("a", "b"): 4, ("a", "a"): 1}


def test_skipgram_window_and_ordering(spark):
    import pytest

    from xml_to_parquet_spark.functions.association import (
        skipgram_cooccurrence,
    )

    df = spark.createDataFrame(
        [(1, "x y z w")], "doc_id long, text string"
    )
    # window=1: adjacent only
    out1 = {
        (r.t1, r.t2): r.n
        for r in skipgram_cooccurrence(
            df, window=1, min_count=1, top_k=100
        ).collect()
    }
    assert out1 == {("x", "y"): 1, ("y", "z"): 1, ("w", "z"): 1}
    # window bigger than the doc: all C(4,2) ordered-position pairs
    out9 = skipgram_cooccurrence(df, window=9, min_count=1, top_k=100)
    assert sum(r.n for r in out9.collect()) == 6
    # deterministic ordering: n desc then lexicographic
    rows = skipgram_cooccurrence(
        df, window=9, min_count=1, top_k=100
    ).collect()
    keys = [(-r.n, r.t1, r.t2) for r in rows]
    assert keys == sorted(keys)
    with pytest.raises(ValueError):
        skipgram_cooccurrence(df, window=0)
