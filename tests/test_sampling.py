"""Sampling / mixture / top-k / contamination operators.

The load-bearing property throughout: determinism under repartitioning —
the sample a 1000-executor cluster draws must equal the one local[4] draws.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from xml_to_parquet_spark.functions.sampling import (
    hash_sample,
    hex_threshold,
    stratified_hash_sample,
    weighted_mixture,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "000000"
    assert hex_threshold(1.0) == "gggggg"  # sorts above every hex string
    assert hex_threshold(0.5) == "800000"
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_hash_sample_partition_invariant(docs):
    a = sorted(
        r.doc_id for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in hash_sample(docs.repartition(13), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_hash_sample_rate_and_salt_independence(docs):
    n = docs.count()
    k = hash_sample(docs, "doc_id", 0.5, salt="a").count()
    # binomial(n, .5): allow generous slack for small-n fixtures
    assert abs(k / n - 0.5) < 0.2
    sel_a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, "a").collect()}
    sel_b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, "b").collect()}
    assert sel_a != sel_b  # different salt → different draw


def test_stratified_rates_respected(docs):
    out = stratified_hash_sample(
        docs, "doc_id", "lang", rates={"en": 0.0}, default_rate=1.0
    )
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "en" not in langs and len(langs) > 0
    assert out.count() == docs.filter(F.col("lang") != "en").count()


def test_weighted_mixture_labels_and_determinism(docs):
    mix = weighted_mixture(
        {"a": (docs, 1.0), "b": (docs, 0.5)}, key_col="doc_id"
    )
    rows = mix.select("doc_id", "mix_source", "shuffle_key").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.mix_source, set()).add(r.doc_id)
    assert by_src["a"] == {r.doc_id for r in docs.collect()}
    assert 0 < len(by_src["b"]) < len(by_src["a"])
    # shuffle_key deterministic: recompute equals
    again = {(r.doc_id, r.mix_source, r.shuffle_key) for r in mix.collect()}
    assert again == {(r.doc_id, r.mix_source, r.shuffle_key) for r in rows}


def test_grouped_topk_semantics_and_plan(docs):
    from xml_to_parquet_spark.operators.window import grouped_topk

    out = grouped_topk(
        docs.select("lang", "doc_id", "n_chars"),
        ["lang"],
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        k=2,
    )
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r)
    for lang, rs in per.items():
        assert len(rs) <= 2
        top = sorted(
            docs.filter(F.col("lang") == lang).collect(),
            key=lambda r: (-r.n_chars, r.doc_id),
        )[: len(rs)]
        assert sorted(r.doc_id for r in rs) == sorted(r.doc_id for r in top)
    # WindowGroupLimit must appear: the pre-shuffle top-k push-down
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_contamination_flags_planted_dup(spark):
    from xml_to_parquet_spark.functions.dedup import contamination_check

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [
            (1, base),  # exact copy of eval doc 100 → overlap 1.0
            (2, "totally unrelated words nothing shared here at all ok"),
            (3, base + " lambda mu"),  # superset → high overlap
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame([(100, base)], "doc_id long, text string")
    out = {
        r.train_id: (r.eval_id, r.overlap)
        for r in contamination_check(train, evals, min_overlap=0.5).collect()
    }
    assert out[1] == (100, 1.0)
    assert 3 in out and out[3][1] > 0.5
    assert 2 not in out


def test_training_shards_global_order(spark, sf_dir, tmp_path):
    """Shards are range-placed and internally sorted → reading files in
    partition order reproduces the exact global ORDER BY shuffle_key."""
    from xml_to_parquet_spark.functions.sampling import weighted_mixture
    from xml_to_parquet_spark.sinks.writers import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mix = weighted_mixture({"a": (docs, 1.0), "b": (docs, 0.6)}, "doc_id")
    out = str(tmp_path / "shards")
    write_training_shards(mix, out, n_shards=4)

    import glob

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) > 1
    streamed = []
    for f in files:
        part = [r.shuffle_key for r in spark.read.parquet(f).collect()]
        assert part == sorted(part)  # sorted within shard
        streamed.extend(part)
    expect = [
        r.shuffle_key
        for r in mix.select("shuffle_key").orderBy("shuffle_key").collect()
    ]
    assert streamed == expect  # global order across shard files


def test_assign_split_exhaustive_disjoint_invariant(spark):
    from xml_to_parquet_spark.functions.sampling import assign_split

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = {r.doc_id: r.split for r in assign_split(docs, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in assign_split(docs.repartition(13), "doc_id").collect()
    }
    assert a == b  # partitioning-invariant
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    train_frac = sum(1 for s in a.values() if s == "train") / n
    assert 0.85 < train_frac < 0.95  # 0.9 nominal


def test_assign_split_fractions_must_sum_to_one(spark):
    import pytest

    from xml_to_parquet_spark.functions.sampling import assign_split

    df = spark.range(5)
    with pytest.raises(ValueError):
        assign_split(df, "id", fractions={"a": 0.5, "b": 0.6})


def test_leakage_safe_split_keeps_clusters_together(spark):
    from xml_to_parquet_spark.functions.sampling import leakage_safe_split

    # 60 singleton docs + 3 explicit near-dup chains of 4 docs each
    rows = [(i,) for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id"])
    pairs = spark.createDataFrame(
        [(100, 101), (101, 102), (102, 103),
         (200, 201), (201, 202), (202, 203),
         (300, 301), (301, 302), (302, 303)],
        ["id_a", "id_b"],
    )
    cluster_docs = spark.createDataFrame(
        [(i,) for i in (100, 101, 102, 103, 200, 201, 202, 203,
                        300, 301, 302, 303)],
        ["doc_id"],
    )
    out = leakage_safe_split(
        docs.unionByName(cluster_docs), pairs, iterations=4
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # exhaustive, disjoint
    assert len(by_id) == 72
    assert set(r["split"] for r in out) <= {"train", "val", "test"}
    # every chain shares one cluster_id = min member, hence ONE split
    for base in (100, 200, 300):
        members = [by_id[base + j] for j in range(4)]
        assert {m["cluster_id"] for m in members} == {base}
        assert len({m["split"] for m in members}) == 1
    # singletons keep their own id as the cluster key → identical decision
    # to plain assign_split (the no-near-dup fast path degrades gracefully)
    from xml_to_parquet_spark.functions.sampling import assign_split

    plain = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs, key_col="doc_id").collect()
    }
    for i in range(60):
        assert by_id[i]["split"] == plain[i]


def test_leakage_safe_split_no_pair_straddles(spark, sf_dir):
    from xml_to_parquet_spark.functions.dedup import minhash_lsh_candidates
    from xml_to_parquet_spark.functions.sampling import leakage_safe_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = minhash_lsh_candidates(docs)
    split = leakage_safe_split(docs, cand, iterations=3)
    a = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    crossers = (
        cand.join(a, "id_a").join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert crossers == 0


def test_k_anonymize_suppression_semantics(spark):
    from xml_to_parquet_spark.functions.sampling import k_anonymize

    rows = [
        (0, "en", "a"), (1, "en", "a"), (2, "en", "a"),   # class of 3
        (3, "fr", "a"), (4, "fr", "a"),                   # class of 2
        (5, "de", None), (6, "de", None),                 # NULL quasi class
        (7, "zh", "b"),                                   # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, src string")
    out = {
        r.doc_id: r
        for r in k_anonymize(df, ["lang", "src"], k=3).collect()
    }
    assert len(out) == 8  # every row survives
    assert out[0].lang == "en" and out[0].suppressed == 0 and out[0].grp_n == 3
    # class of 2 suppressed
    assert out[3].lang is None and out[3].src is None and out[3].suppressed == 1
    assert out[3].grp_n == 2
    # NULL quasi values form a real class (size 2 < k -> suppressed),
    # and the null-safe join still found the class size
    assert out[5].grp_n == 2 and out[5].suppressed == 1
    assert out[7].grp_n == 1 and out[7].suppressed == 1


def test_k_anonymize_guarantee_holds(spark):
    from xml_to_parquet_spark.functions.sampling import k_anonymize

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = k_anonymize(docs, ["lang", "source"], k=5)
    # the k-anonymity property: every UNSUPPRESSED quasi combination
    # appears at least k times in the released table
    released = (
        out.filter(F.col("suppressed") == 0)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert released.filter(F.col("n") < 5).count() == 0
    # and suppression actually triggered on this corpus
    assert out.filter(F.col("suppressed") == 1).count() > 0
    assert out.count() == docs.count()


def test_poisson_bootstrap_python_replay_and_invariance(spark):
    import hashlib

    from xml_to_parquet_spark.functions.sampling import (
        POISSON1_T52,
        poisson_bootstrap_means,
    )

    rows = [(i, float(10 + i % 7)) for i in range(300)]
    rows.append((999, None))  # NULL measure must not bias anything
    df = spark.createDataFrame(rows, "doc_id long, val double")

    def weight(key, r):
        h = int(hashlib.md5(f"{key}:boot:{r}".encode()).hexdigest()[:13], 16)
        return sum(h >= t for t in POISSON1_T52)

    # exact python replay of replicate 0 and 3
    for rep in (0, 3):
        n = s = 0
        for k, v in rows:
            if v is None:
                continue
            w = weight(k, rep)
            n += w
            s += w * v
        got = {
            r.replicate: r for r in poisson_bootstrap_means(
                df, "val", "doc_id", replicates=4
            ).collect()
        }
        assert got[rep].n_eff == n
        assert abs(got[rep].est_mean - s / n) < 1e-12
        assert got[-1].n_eff == 300  # NULL row excluded from the base too
    # partition invariance: deterministic draws, any layout
    a = poisson_bootstrap_means(df.repartition(1), "val", "doc_id").collect()
    b = poisson_bootstrap_means(df.repartition(7), "val", "doc_id").collect()
    assert [(r.replicate, r.n_eff, r.est_mean) for r in a] == [
        (r.replicate, r.n_eff, r.est_mean) for r in b
    ]
    # bootstrap sanity: replicate draws are Poisson(1) -> n_eff near n,
    # means spread AROUND the point estimate (not all equal, none absurd)
    means = [r.est_mean for r in a if r.replicate >= 0]
    point = [r.est_mean for r in a if r.replicate == -1][0]
    assert len(set(means)) > 1
    assert all(abs(m - point) < 1.0 for m in means)


def test_percentile_rank_normalize_semantics(spark):
    from xml_to_parquet_spark.functions.sampling import (
        percentile_rank_normalize,
    )

    rows = [
        (0, "a", 10.0), (1, "a", 20.0), (2, "a", 20.0), (3, "a", 40.0),
        (4, "b", 99.0),                      # single-row slice
        (5, "c", 1.0), (6, "c", 2.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {
        r.doc_id: r.pr_ppm
        for r in percentile_rank_normalize(df, "score", "source").collect()
    }
    # slice a (n=4): ranks 0..3 over (n-1)=3
    assert out[0] == 0 and out[3] == 10**6
    # tie at 20.0 broken by id: doc 1 rank 2 -> 333333, doc 2 rank 3 -> 666666
    assert out[1] == 10**6 // 3 and out[2] == 2 * 10**6 // 3
    # single-row slice: no evidence -> 0 (not div-by-zero)
    assert out[4] == 0
    assert out[5] == 0 and out[6] == 10**6
    # the calibration property: every slice's max is 1e6 regardless of
    # raw score magnitude (99.0 in b vs 2.0 in c)


def test_percentile_rank_normalize_partition_invariant(spark):
    from xml_to_parquet_spark.functions.sampling import (
        percentile_rank_normalize,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = [
        sorted(
            (r.doc_id, r.pr_ppm)
            for r in percentile_rank_normalize(
                docs.repartition(p), "n_chars", "source"
            ).collect()
        )
        for p in (1, 7)
    ]
    assert res[0] == res[1] and len(res[0]) > 0


def test_chunk_documents_boundaries(spark):
    from xml_to_parquet_spark.functions.sampling import chunk_documents

    # C=10, V=4 => stride 6. Lengths probe every boundary rule:
    # len<=C one chunk; len=C+1 two chunks; exact-stride end; tail.
    docs = [
        (1, "abcdefghij"),          # len 10 == C -> 1 chunk
        (2, "abcdefghijk"),         # len 11 -> 2 chunks, tail "ghijk"
        (3, "abcdefghijklmnop"),    # len 16 = C + stride -> 2 chunks
        (4, "short"),               # len 5 -> 1 chunk
        (5, ""),                    # empty -> no chunks
        (6, None),                  # NULL -> no chunks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_chars=10, overlap=4)
    rows = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.chunk_text, r.chunk_len)
        for r in out.collect()
    }
    assert rows[(1, 0)] == (0, "abcdefghij", 10)
    assert (1, 1) not in rows
    assert rows[(2, 0)] == (0, "abcdefghij", 10)
    assert rows[(2, 1)] == (6, "ghijk", 5)
    assert rows[(3, 0)] == (0, "abcdefghij", 10)
    assert rows[(3, 1)] == (6, "ghijklmnop", 10)
    assert rows[(4, 0)] == (0, "short", 5)
    assert all(d not in (5, 6) for d, _ in rows)
    # every chunk overlaps its predecessor by exactly `overlap` chars
    assert rows[(2, 0)][1][6:] == rows[(2, 1)][1][:4]


def test_chunk_documents_reconstructs_and_covers(spark):
    from xml_to_parquet_spark.functions.sampling import chunk_documents

    texts = ["x" * n for n in (1, 149, 150, 151, 200, 201, 350, 999)]
    # use distinct chars so reconstruction is content-checked, not just
    # length-checked
    texts = [
        "".join(chr(97 + (i + 7 * d) % 26) for i in range(len(t)))
        for d, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_chars=200, overlap=50)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, text in enumerate(texts):
        chunks = sorted(by_doc[d], key=lambda r: r.chunk_idx)
        # stitch: first chunk whole, then drop each successor's overlap
        stitched = chunks[0].chunk_text + "".join(
            c.chunk_text[50:] for c in chunks[1:]
        )
        assert stitched == text, f"doc {d} len {len(text)}"
        # last chunk reaches the end, none is empty
        assert chunks[-1].chunk_start + chunks[-1].chunk_len == len(text)
        assert all(c.chunk_len > 0 for c in chunks)


def test_chunk_documents_validates_overlap(spark):
    import pytest

    from xml_to_parquet_spark.functions.sampling import chunk_documents

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=10, overlap=-1)


# ---------------------------------------------------------------------------
# No-split NFD packing (r10)
# ---------------------------------------------------------------------------


def test_pack_nosplit_hand_traced(spark):
    from xml_to_parquet_spark.functions.sampling import pack_sequences_nosplit

    # one shard (ids 0..5 all < 64): sizes desc = 9(id2),7(id0),5(id4),
    # 4(id1),3(id5),2(id3); budget 12 → bins: [9]=9, +7>12 → new [7,5]=12,
    # +4>12 → new [4,3,2]=9
    rows = [(0, 7), (1, 4), (2, 9), (3, 2), (4, 5), (5, 3)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_fill"])
        for r in pack_sequences_nosplit(df, budget=12).collect()
    }
    assert got == {
        2: (0, 9), 0: (1, 7), 4: (1, 12),
        1: (2, 4), 5: (2, 7), 3: (2, 9),
    }


def test_pack_nosplit_oversize_and_guards(spark):
    import pytest as _pytest

    from xml_to_parquet_spark.functions.sampling import pack_sequences_nosplit

    rows = [(0, 30), (1, 5), (2, 6)]  # 30 > budget 10 → own flagged bin
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_fill"])
        for r in pack_sequences_nosplit(df, budget=10).collect()
    }
    assert got[0] == (0, 30)  # bin_fill > budget flags the oversize doc
    assert got[2] == (1, 6)  # next after the oversize opens a fresh bin
    assert got[1] == (2, 5)  # 6+5 > 10 → next-fit opens another
    with _pytest.raises(ValueError, match="budget"):
        pack_sequences_nosplit(df, budget=0)
    with _pytest.raises(ValueError, match="shard_size"):
        pack_sequences_nosplit(df, budget=10, shard_size=0)


def test_pack_nosplit_partition_invariant_and_shards(spark):
    from xml_to_parquet_spark.functions.sampling import pack_sequences_nosplit

    rows = [(i, 100 + (i * 37) % 251) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    one = sorted(
        tuple(r)
        for r in pack_sequences_nosplit(df, budget=700, shard_size=32)
        .collect()
    )
    many = sorted(
        tuple(r)
        for r in pack_sequences_nosplit(
            df.repartition(13), budget=700, shard_size=32
        ).collect()
    )
    assert one == many
    # shards are id DIV 32; no bin ever overflows unless a single oversize doc
    for shard, doc_id, n, b, fill in one:
        assert shard == doc_id // 32
        assert fill <= 700 or fill == n


# ---------------------------------------------------------------------------
# priority sampling (Duffield–Lund–Thorup)
# ---------------------------------------------------------------------------


def test_priority_sample_exhaustive_when_small(spark):
    from xml_to_parquet_spark.functions.sampling import priority_sample

    rows = [(i, 10 * (i + 1)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = priority_sample(df, "w", k=64).collect()
    # ≤ k positive-weight rows: the sample is the corpus, τ=0, est == w
    assert len(got) == 5
    assert all(r.est_weight == r.weight for r in got)
    assert sorted(r.key for r in got) == [0, 1, 2, 3, 4]


def test_priority_sample_partition_invariant(spark):
    from xml_to_parquet_spark.functions.sampling import priority_sample

    rows = [(i, 1 + (i * 37) % 97) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    draws = [
        [tuple(r) for r in priority_sample(df.repartition(p), "w", k=20)
         .collect()]
        for p in (1, 13)
    ]
    assert draws[0] == draws[1]
    assert len(draws[0]) == 20


def test_priority_sample_subset_sum_estimator(spark):
    from xml_to_parquet_spark.functions.sampling import priority_sample

    # a dominant heavy item is (essentially) always kept and estimated
    # at its true weight (est = max(w, τ) = w when w >= τ); the total
    # estimate over one fixed deterministic draw lands near the truth
    rows = [(i, 1 + (i * 37) % 97) for i in range(1000)] + [(5000, 10**6)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = priority_sample(df, "w", k=100, salt="t1").collect()
    by_key = {r.key: r for r in got}
    assert 5000 in by_key
    assert by_key[5000].est_weight == 10**6
    true_total = sum(w for _, w in rows)
    est_total = sum(r.est_weight for r in got)
    # single fixed draw, generous bound (DLT variance at k=100 is far
    # tighter; this guards gross estimator bugs, not distribution tails)
    assert abs(est_total - true_total) / true_total < 0.25


def test_priority_sample_drops_nonpositive_weights(spark):
    from xml_to_parquet_spark.functions.sampling import priority_sample

    rows = [(1, 0), (2, -5), (3, 7), (4, 3)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = priority_sample(df, "w", k=10).collect()
    assert sorted(r.key for r in got) == [3, 4]


def test_priority_sample_matches_duckdb_replay(spark, sf_dir):
    import duckdb

    from xml_to_parquet_spark.functions.sampling import (
        priority_sample,
        priority_sample_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r.key, r.weight, r.est_weight, r.rk)
        for r in priority_sample(docs, "n_chars", k=32, salt="x").collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = [
        tuple(r)
        for r in con.execute(
            priority_sample_sql("documents", "n_chars", k=32, salt="x")
        ).fetchall()
    ]
    assert got == want


def test_grouped_priority_sample_independent_per_group(spark):
    from xml_to_parquet_spark.functions.sampling import (
        grouped_priority_sample,
        priority_sample,
    )

    rows = [(i, ["a", "b"][i % 2], 1 + (i * 37) % 97) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w long")
    got = grouped_priority_sample(df, "g", "w", k=10).collect()
    assert len(got) == 20
    # each group's draw equals the global sampler run on that group
    # alone (same priorities, per-group cutoff)
    for g in ("a", "b"):
        solo = [
            (r.key, r.weight, r.est_weight, r.rk)
            for r in priority_sample(
                df.filter(F.col("g") == g), "w", k=10
            ).collect()
        ]
        grouped = [
            (r.key, r.weight, r.est_weight, r.rk)
            for r in got
            if r.g == g
        ]
        assert grouped == solo, g


def test_grouped_priority_sample_exhaustive_group_exact(spark):
    from xml_to_parquet_spark.functions.sampling import (
        grouped_priority_sample,
    )

    # group "tiny" has 3 rows <= k: exhaustive, est == w; group "big"
    # has 50 rows: thresholded
    rows = [(i, "tiny", 5 + i) for i in range(3)]
    rows += [(100 + i, "big", 1 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w long")
    got = grouped_priority_sample(df, "g", "w", k=8).collect()
    tiny = [r for r in got if r.g == "tiny"]
    assert len(tiny) == 3
    assert all(r.est_weight == r.weight for r in tiny)
    assert len([r for r in got if r.g == "big"]) == 8


def test_grouped_priority_sample_matches_duckdb(spark, sf_dir):
    import duckdb

    from xml_to_parquet_spark.functions.sampling import (
        grouped_priority_sample,
        grouped_priority_sample_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        tuple(r)
        for r in grouped_priority_sample(
            docs.repartition(13), "lang", "n_chars", k=16, salt="g13"
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = [
        tuple(r)
        for r in con.execute(
            grouped_priority_sample_sql(
                "documents", "lang", "n_chars", k=16, salt="g13"
            )
        ).fetchall()
    ]
    assert got == want


def test_top_p_select_minimal_covering_prefix(spark):
    from xml_to_parquet_spark.functions.sampling import top_p_select

    # weights 50,30,12,5,3 (total 100): p=0.8 -> keep 50,30 (cum 80)
    # because before-row cum of the 12-row is 80 = p*total (not <)
    rows = [("g", "a", 50), ("g", "b", 30), ("g", "c", 12),
            ("g", "d", 5), ("g", "e", 3)]
    df = spark.createDataFrame(rows, "grp string, id string, n long")
    got = top_p_select(df, ["grp"], "n", "id", 4, 5).collect()
    assert [(r.id, r.rank, r.cum_weight) for r in got] == [
        ("a", 1, 50), ("b", 2, 80)
    ]
    assert got[-1].cum_share_ppm == 800_000
    # p=0.81 -> the crossing row IS kept
    got2 = top_p_select(df, ["grp"], "n", "id", 81, 100).collect()
    assert [r.id for r in got2] == ["a", "b", "c"]


def test_top_p_select_tie_break_and_partition_invariance(spark):
    from xml_to_parquet_spark.functions.sampling import top_p_select

    rows = [("g", f"id{i}", 10) for i in range(10)]  # all tied
    a = top_p_select(
        spark.createDataFrame(rows, "grp string, id string, n long")
        .repartition(1),
        ["grp"], "n", "id", 1, 2,
    ).collect()
    b = top_p_select(
        spark.createDataFrame(rows[::-1], "grp string, id string, n long")
        .repartition(8),
        ["grp"], "n", "id", 1, 2,
    ).collect()
    assert a == b
    # exactly the 5 lexicographically-smallest ids survive at p=1/2
    assert [r.id for r in a] == ["id0", "id1", "id2", "id3", "id4"]


def test_top_p_select_full_mass_and_validation(spark):
    import pytest

    from xml_to_parquet_spark.functions.sampling import top_p_select

    rows = [("g", "a", 1), ("g", "b", 1)]
    df = spark.createDataFrame(rows, "grp string, id string, n long")
    assert top_p_select(df, ["grp"], "n", "id", 1, 1).count() == 2
    with pytest.raises(ValueError, match="p_num"):
        top_p_select(df, ["grp"], "n", "id", 0, 5)
    with pytest.raises(ValueError, match="p_num"):
        top_p_select(df, ["grp"], "n", "id", 6, 5)


def test_top_p_select_duckdb_replay(spark):
    import duckdb

    from pyspark.sql import functions as F

    from xml_to_parquet_spark.functions.sampling import (
        top_p_select,
        top_p_select_sql,
    )

    df = spark.range(300).select(
        (F.col("id") % 3).alias("grp"),
        F.col("id").alias("item"),
        (F.col("id") * 31 % 97 + 1).alias("n"),
    )
    got = [
        tuple(r)
        for r in top_p_select(df, ["grp"], "n", "item", 7, 10).collect()
    ]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        top_p_select_sql("t", ["grp"], "n", "item", 7, 10)
    ).fetchall()
    assert got == want
