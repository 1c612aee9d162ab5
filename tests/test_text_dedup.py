"""Tests for text analysis + dedup operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.functions import dedup, text


def _docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "The quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The quick brown fox jumps over the lazy cat"),  # near dup
        (4, "el gato y el perro en la casa de la abuela"),
        (5, "completely different words entirely here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark):
    df = spark.createDataFrame([("a b  c ",), ("one",)], "text string")
    out = df.select(
        text.token_count(F.col("text")).alias("t"),
        text.subtoken_count(F.col("text")).alias("s"),
    ).collect()
    assert [r.t for r in out] == [3, 1]


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(1, "The cat, the dog!")], "doc_id long, text string"
    )
    r = text.quality_features(df).collect()[0]
    assert r.n_tokens == 4
    assert r.punct_ratio == 2 / 17
    assert r.stopword_ratio == 2 / 4  # 'the' twice


def test_language_id(spark):
    df = _docs(spark)
    got = {
        r.doc_id: r.lang
        for r in df.select(
            "doc_id", text.language_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert got[1] == "en" and got[4] == "es"


def test_fingerprints_normalize(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")],
        "doc_id long, text string",
    )
    fps = {
        r.doc_id: (r.fp, r.roll)
        for r in df.select(
            "doc_id",
            text.fingerprint_md5(F.col("text")).alias("fp"),
            text.fingerprint_rolling(F.col("text")).alias("roll"),
        ).collect()
    }
    assert fps[1] == fps[2]  # case/whitespace-insensitive
    assert fps[1] != fps[3]
    assert isinstance(fps[1][1], int) and fps[1][1] > 0


def test_exact_dedup(spark):
    out = dedup.exact_dedup(_docs(spark)).collect()
    assert len(out) == 4  # 5 docs, one exact dup collapsed
    dup = [r for r in out if r.n_copies == 2][0]
    assert dup.keep_id == 1


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    sh = dedup.shingle_table(df).collect()
    assert [r.shingle for r in sh] == ["one two"]


def test_ngram_jaccard_pairs(spark):
    pairs = dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert got[(1, 2)] == 1.0  # identical docs
    assert (1, 3) in got and got[(1, 3)] < 1.0  # near dup above 0.5
    assert (1, 4) not in got


def test_minhash_lsh_finds_exact_and_near_dups(spark):
    cand = dedup.minhash_lsh_candidates(_docs(spark)).collect()
    got = {(r.id_a, r.id_b) for r in cand}
    assert (1, 2) in got  # identical signatures share every band
    assert (1, 5) not in got and (4, 5) not in got


def test_minhash_signature_matches_oracle(spark):
    """Spark minhash signatures must equal the DuckDB construction."""
    import duckdb

    df = _docs(spark)
    sig = {
        (r.doc_id, r.perm_id): r.minhash
        for r in dedup.minhash_signatures(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({r.doc_id}, '{r.text}')" for r in df.collect()
        )
        + ") t(doc_id, text)"
    )
    oracle = con.execute(dedup.minhash_sql("docs")).fetchall()
    osig = {(r[0], r[1]): r[2] for r in oracle}
    assert sig == osig


def test_simhash_and_neardup(spark):
    sig = dedup.simhash(_docs(spark))
    rows = {r.doc_id: r.simhash for r in sig.collect()}
    assert rows[1] == rows[2]  # identical docs → identical signature
    pairs = dedup.simhash_neardup_pairs(sig, max_hamming=6).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert (1, 4) not in got  # different language/content far apart


def test_simhash_64bit_scale_contract(spark):
    """r11: the docs100 rung showed 32-bit codes saturating near 500k
    docs, so bits=64 is the scale contract — the top word must carry
    real votes (independently-salted hash), identical docs must still
    collide, the low 32 bits must match the 32-bit signature exactly
    (bit-compatible growth), and the pigeonhole blocker must agree with
    the all-pairs twin at bits=64."""
    docs = _docs(spark)
    sig32 = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    sig64 = {
        r.doc_id: r.simhash
        for r in dedup.simhash(docs, bits=64).collect()
    }
    assert sig64[1] == sig64[2]  # identical docs still collide
    mask32 = (1 << 32) - 1
    for d in sig32:
        assert sig64[d] & mask32 == sig32[d] & mask32
    # the high word is not degenerate: some doc uses bits >= 32
    assert any((s >> 32) & mask32 for s in sig64.values()), sig64
    s64 = dedup.simhash(docs, bits=64)
    blocked = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_blocked_pairs(
            s64, max_hamming=3, bits=64
        ).collect()
    }
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_neardup_pairs(s64, max_hamming=3).collect()
    }
    assert blocked == brute
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bits"):
        dedup.simhash(docs, bits=65)


def test_simhash_pairs_auto_width_dispatch(spark):
    """simhash_bits_for: uniform-birthday crossover (32 below ~20k docs
    at k=3, 64 above); simhash_pairs_auto at a small corpus must equal
    the explicit 32-bit two-stage path."""
    assert dedup.simhash_bits_for(1000) == 32
    assert dedup.simhash_bits_for(5000) == 32
    assert dedup.simhash_bits_for(100_000) == 64
    assert dedup.simhash_bits_for(1_000_000_000) == 64
    # stricter budget flips earlier; k=1 tolerates more docs at 32-bit
    assert dedup.simhash_bits_for(5000, chance_pair_budget=1e-6) == 64
    assert dedup.simhash_bits_for(200_000, max_hamming=0) == 32
    docs = _docs(spark)
    auto = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_pairs_auto(docs, max_hamming=3).collect()
    }
    explicit = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_blocked_pairs(
            dedup.simhash(docs, bits=32), max_hamming=3, bits=32
        ).collect()
    }
    assert auto == explicit


def test_simhash_wide_word0_matches_narrow(spark):
    """simhash_wide's word 0 uses the same token-hash salts as the
    one-BIGINT simhash at bits=64 — pinned so the wide path is a strict
    extension, not a silent re-hash."""
    docs = _docs(spark)
    narrow = {r.doc_id: r.simhash for r in dedup.simhash(docs, bits=64).collect()}
    wide = {
        r.doc_id: r.simhash
        for r in dedup.simhash_wide(docs, bits=128).collect()
    }
    for d, sig in wide.items():
        assert len(sig) == 2
        assert sig[0] == narrow[d]
    assert wide[1] == wide[2]  # identical docs collide at 128 bits
    assert any(s[1] != 0 for s in wide.values())  # word 1 carries votes
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 64"):
        dedup.simhash_wide(docs, bits=96)


def test_simhash_blocked_pairs_wide_exact_vs_brute(spark):
    """Pigeonhole blocking over 128-bit (2-word) signatures must equal
    brute force, including radii whose chunks straddle the word
    boundary (k=12 -> 13 chunks of width 10: chunk at bit 60 spans
    words). Signatures chosen adversarially: sign-bit-dense, near-dup
    clusters, and word-boundary-flip patterns."""
    import random

    rng = random.Random(11)
    base = [rng.getrandbits(64) - (1 << 63) for _ in range(2)]

    def flip(sig, positions):
        out = list(sig)
        for p in positions:
            out[p // 64] ^= 1 << (p % 64)
            if out[p // 64] >= 1 << 63:
                out[p // 64] -= 1 << 64
        return out

    rows = [(0, base)]
    # near-dups at distances 1..14, several straddling bit 60..69
    for i, d in enumerate(range(1, 15), start=1):
        rows.append((i, flip(base, rng.sample(range(128), d))))
    rows.append((20, flip(base, [60, 61, 62, 63, 64, 65])))  # boundary
    # THE killer pattern (r11 review): one flip per pigeonhole chunk —
    # at k=13 (14 chunks) every chunk of the OLD ceil-width layout
    # (13 chunks of width 10) disagreed and the pair was silently
    # dropped; boundary-based chunking must keep >=1 chunk agreeing
    rows.append((21, flip(base, list(range(0, 128, 10)))))  # 13 flips
    rows.append((22, flip(base, [128 * c // 14 for c in range(13)])))
    rows.extend(
        (30 + j, [rng.getrandbits(64) - (1 << 63) for _ in range(2)])
        for j in range(6)
    )
    df = spark.createDataFrame(
        rows, "doc_id long, simhash array<long>"
    )
    # k=1 exercises the chunks-raised-to-words floor, 13 the killer
    # pattern, 20 a wide radius; intermediate k add runtime, not cases
    for k in (1, 13, 20):
        blocked = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_blocked_pairs_wide(
                df, max_hamming=k, bits=128
            ).collect()
        }
        brute = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_neardup_pairs_wide(
                df, max_hamming=k
            ).collect()
        }
        assert blocked == brute, f"k={k}"


def test_simhash_blocked_pairs_narrow_high_radius(spark):
    """bits=64 with k=14 (the regime simhash_pairs_auto's k-doubling
    reaches from max_hamming=7): the old ceil-width chunking shifted by
    c*width >= 64, which the JVM wraps mod 64 — aliased keys silently
    broke pigeonhole completeness. One-flip-per-chunk signatures are
    the killer pattern; blocked must equal brute."""
    base = -(1 << 63) + 0x123456789ABCDEF
    rows = [(0, base)]
    for i, k in enumerate((14, 13, 7), start=1):
        sig = base
        for p in [64 * c // 15 for c in range(k)]:  # one per chunk
            sig ^= 1 << p
            if sig >= 1 << 63:
                sig -= 1 << 64
        rows.append((i, sig))
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    for k in (3, 14):
        blocked = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_blocked_pairs(
                df, max_hamming=k, bits=64
            ).collect()
        }
        brute = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_neardup_pairs(
                df, max_hamming=k
            ).collect()
        }
        assert blocked == brute, f"k={k}"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_blocked_pairs(df, max_hamming=64, bits=64)


def test_simhash_bits_for_ladder_reaches_128():
    # 5e9 docs at k=3-equivalent: 64-bit chance pairs exceed the 1%
    # budget (5.6e7 > 5e7) -> the ladder steps to 128
    assert dedup.simhash_bits_for(5_000_000_000) == 128
    assert dedup.simhash_bits_for(1_000_000_000) == 64
    # 128 holds far past any current corpus
    assert dedup.simhash_bits_for(10_000_000_000_000) == 128


def test_repetition_features_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # 6 tokens, 2 distinct; "a b" ×3 of 5
            (2, "x y z w"),              # all distinct; each bigram once
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.repetition_features(df).collect()}
    r1 = rows[1]
    assert (r1.n_tokens, r1.n_distinct_tokens) == (6, 2)
    assert abs(r1.dup_token_frac - 4 / 6) < 1e-12
    assert (r1.top_bigram_n, r1.n_bigrams) == (3, 5)
    r2 = rows[2]
    assert r2.dup_token_frac == 0.0 and r2.top_bigram_n == 1


def test_quality_gate_reasons(spark):
    df = spark.createDataFrame(
        [
            (1, "short doc"),                       # < 20 tokens
            (2, " ".join(["spam"] * 30)),           # 1 distinct token
            (3, " ".join(f"w{i}" for i in range(30))),  # clean
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.keep, r.drop_reason) for r in text.quality_gate(df).collect()}
    assert got[1] == (False, "too_short")
    assert got[2] == (False, "too_repetitive")
    assert got[3] == (True, "ok")


def test_pack_sequences_offsets_and_chunks(spark):
    from xml_to_parquet_spark.functions.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 100)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: r for r in pack_sequences(df, budget=512).collect()}
    assert rows[1].start_offset == 0 and rows[1].start_chunk == 0
    # doc2 starts at 300, ends at 599 → straddles chunks 0 and 1
    assert (rows[2].start_chunk, rows[2].end_chunk, rows[2].n_chunks) == (0, 1, 2)
    assert rows[3].start_offset == 600 and rows[3].start_chunk == 1


def test_pack_sequences_sharded_parallel_windows(spark):
    from xml_to_parquet_spark.functions.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, "a", 300), (2, "a", 300), (3, "b", 400)],
        "doc_id long, src string, n_tokens long",
    )
    rows = {
        r.doc_id: r
        for r in pack_sequences(df, budget=512, shard_col="src").collect()
    }
    # each shard is its own token stream: doc3 restarts at offset 0
    assert rows[3].start_offset == 0
    assert rows[2].start_offset == 300


def test_dedup_clusters_chain_and_island(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (8, 9)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(pairs, iterations=3).collect()
    }
    # 4-chain: min label 1 reaches node 4 within 3 hops; island keeps 8
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_scrub_pii_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [(1, "a@b.com and c@d.org, see http://x.y/z or 99887766551")],
        "doc_id long, text string",
    )
    r = text.scrub_pii(df).collect()[0]
    assert (r.n_email, r.n_url, r.n_number) == (2, 1, 1)
    assert r.scrubbed_text == "<EMAIL> and <EMAIL>, see <URL> or <NUM>"


def test_dedup_against_corpus_normalized_match(spark):
    new = spark.createDataFrame(
        [(10, "Hello   World"), (11, "fresh doc")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    # normalization (case/whitespace) makes doc 10 a duplicate of the corpus
    kept = [r.doc_id for r in dedup.dedup_against_corpus(new, corpus).collect()]
    assert kept == [11]


def test_dedup_apply_keeps_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 4), (5, 4)], "doc_id long, cluster_id long"
    )
    kept = sorted(
        r.doc_id for r in dedup.dedup_apply(docs, clusters).collect()
    )
    # 2 and 5 are non-representative members; 0 and 3 were never clustered
    assert kept == [0, 1, 3, 4]


def test_star_contraction_long_chain(spark):
    # a 13-node path: the adversarial case for fixed-k plain propagation —
    # star contraction must still collapse it to the component minimum
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters_star(pairs).collect()
    }
    assert got == {i: 0 for i in range(13)}


@pytest.mark.filterwarnings("ignore::DeprecationWarning")
def test_fuzzy_pairs_length_blocking_exact(spark):
    # INTENTIONAL deprecated-path coverage (ADVICE r11 hygiene): the
    # legacy fuzzy_pairs stays callable until a removal round, so its
    # exactness contract stays pinned; the warning itself is pinned by
    # test_fuzzy_pairs_warns_deprecated.
    docs = spark.createDataFrame(
        [
            (1, "kitten"),
            (2, "sitten"),       # distance 1 from kitten
            (3, "sittin"),       # distance 1 from sitten, 2 from kitten
            (4, "completely different phrase"),
            (5, "kitte"),        # distance 1 from kitten (len differs)
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.distance
        for r in dedup.fuzzy_pairs(docs, "text", max_distance=2).collect()
    }
    assert got[(1, 2)] == 1 and got[(2, 3)] == 1 and got[(1, 3)] == 2
    assert got[(1, 5)] == 1  # cross-length-bucket pair still found
    assert all(k[0] != 4 and k[1] != 4 for k in got)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def _brute_pairs(rows: list[tuple[int, str]], k: int) -> set:
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            d = _lev(sa, sb)
            if d <= k:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, d))
    return out


def _qgram_result(spark, rows, k, q=2) -> set:
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.id_a, r.id_b, r.distance)
        for r in dedup.fuzzy_pairs_qgram(
            df, "text", max_distance=k, q=q, num_partitions=4
        ).collect()
    }


def test_fuzzy_qgram_equals_bruteforce_mixed_corpus(spark):
    """Lossless blocking on an adversarial mix: variable lengths, exact
    duplicates, empty strings, short strings below the gram bound, and
    mutated near-neighbors."""
    import random

    rng = random.Random(42)
    alpha = "abcdef"
    rows, next_id = [], 0
    for _ in range(60):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        rows.append((next_id, base)); next_id += 1
        if rng.random() < 0.6 and base:
            mut = list(base)
            op = rng.choice(["sub", "del", "ins"])
            p = rng.randrange(len(mut))
            if op == "sub":
                mut[p] = rng.choice(alpha)
            elif op == "del":
                del mut[p]
            else:
                mut.insert(p, rng.choice(alpha))
            rows.append((next_id, "".join(mut))); next_id += 1
        if rng.random() < 0.2:
            rows.append((next_id, base)); next_id += 1  # exact duplicate
    for k in (1, 2):
        for q in (2, 3):
            assert _qgram_result(spark, rows, k, q) == _brute_pairs(rows, k)


def test_fuzzy_qgram_uniform_length_worst_case(spark):
    """The corpus that defeats length blocking: every string the same
    length and format. Result must still equal brute force exactly."""
    rows = [(i, f"Item#{i:06d}") for i in range(250)]
    for k in (1, 2):
        assert _qgram_result(spark, rows, k) == _brute_pairs(rows, k)


def _symdel_result(spark, rows, k) -> set:
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.id_a, r.id_b, r.distance)
        for r in dedup.fuzzy_pairs_symdel(
            df, "text", max_distance=k, num_partitions=4
        ).collect()
    }


def test_fuzzy_symdel_equals_bruteforce_mixed_corpus(spark):
    """Symmetric-delete blocking is lossless for k ≤ 2 on an adversarial
    mix: variable lengths, duplicates, empties, one-char strings, and
    transposition-shaped false candidates ("ab"/"ba") that the verify
    stage must reject."""
    import random

    rng = random.Random(7)
    alpha = "abcd"
    rows = [(0, ""), (1, "a"), (2, "b"), (3, "ab"), (4, "ba")]
    next_id = 5
    for _ in range(50):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
        rows.append((next_id, base)); next_id += 1
        if rng.random() < 0.5:
            rows.append((next_id, base)); next_id += 1  # exact duplicate
    for k in (1, 2):
        assert _symdel_result(spark, rows, k) == _brute_pairs(rows, k)


def test_fuzzy_symdel_uniform_format_corpus(spark):
    rows = [(i, f"Item#{i:06d}") for i in range(250)]
    for k in (1, 2):
        assert _symdel_result(spark, rows, k) == _brute_pairs(rows, k)


def test_fuzzy_auto_dispatch_matches_bruteforce(spark):
    """The dispatcher must produce the exact pair set on both its paths:
    short keys (symdel branch) and long texts (q-gram branch)."""
    short_rows = [(i, f"Key#{i:04d}") for i in range(120)]
    assert _result_set(
        spark, short_rows, dedup.fuzzy_pairs_auto, k=1
    ) == _brute_pairs(short_rows, 1)
    long_rows = [
        (i, ("lorem ipsum dolor " * 8) + f"tail{i % 7}") for i in range(40)
    ]
    assert _result_set(
        spark, long_rows, dedup.fuzzy_pairs_auto, k=1
    ) == _brute_pairs(long_rows, 1)


def _result_set(spark, rows, fn, k) -> set:
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.id_a, r.id_b, r.distance)
        for r in fn(df, "text", max_distance=k, num_partitions=4).collect()
    }


def test_fuzzy_symdel_rejects_large_k(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_distance"):
        dedup.fuzzy_pairs_symdel(df, "text", max_distance=3)


def test_dedup_clusters_unconverged_guardrail(spark):
    """Path graph with diameter > iterations (r3 VERDICT #8): bounded
    propagation must not silently return partial labels."""
    n = 10  # path 0-1-...-9, diameter 9
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(ValueError, match="still changing"):
        dedup.dedup_clusters(pairs, iterations=2)
    # star fallback: exact components at any diameter
    star = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(
            pairs, iterations=2, on_unconverged="star"
        ).collect()
    }
    assert star == {i: 0 for i in range(n)}
    # explicit opt-in returns the k-step bounded labels (oracle semantics)
    part = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(
            pairs, iterations=2, on_unconverged="return"
        ).collect()
    }
    assert part[0] == 0 and part[n - 1] > 0  # far end not yet reached


def test_dedup_clusters_fixpoint_at_last_round_is_not_an_error(spark):
    """A 4-chain converges exactly AT round 3: the verification round
    must prove completeness instead of raising."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(pairs, iterations=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_dedup_clusters_bad_mode_rejected(spark):
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="on_unconverged"):
        dedup.dedup_clusters(pairs, on_unconverged="nope")


def test_dedup_apply_best_semantics(spark):
    from xml_to_parquet_spark.functions.dedup import dedup_apply_best

    docs = spark.createDataFrame(
        [
            (1, 10),  # cluster A: 2 beats 1 on score
            (2, 30),
            (3, 30),  # cluster B: tie on score -> min id (3)
            (4, 30),
            (5, 5),   # unclustered: always kept
        ],
        "doc_id long, score long",
    )
    clusters = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "doc_id long, cluster_id string",
    )
    kept = sorted(
        r.doc_id
        for r in dedup_apply_best(docs, clusters, score_col="score").collect()
    )
    assert kept == [2, 3, 5]


def test_dedup_apply_best_composes_with_clusterer(spark):
    """End-to-end with a real clusterer: LSH pairs -> star contraction ->
    best-member retention; exactly one survivor per component, and it is
    the component's max-score member."""
    from xml_to_parquet_spark.functions.dedup import (
        dedup_apply_best,
        dedup_clusters_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    clusters = dedup_clusters_star(pairs)
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 7), (10, 1), (11, 1), (99, 0)],
        "doc_id long, score long",
    )
    kept = {
        r.doc_id
        for r in dedup_apply_best(docs, clusters, score_col="score").collect()
    }
    # component {1,2,3} -> 2 (score 9); {10,11} -> 10 (tie, min id);
    # 99 unclustered -> kept
    assert kept == {2, 10, 99}


def test_dedup_apply_best_label_id_domain_collision(spark):
    """Numeric-string cluster labels must not capture an unclustered doc
    whose id renders to the same string (round-4 ADVICE): doc 0 is
    unclustered while cluster label "0" groups docs 1 and 2 -- doc 0
    must survive as its own singleton, not merge into cluster 0."""
    from xml_to_parquet_spark.functions.dedup import dedup_apply_best

    docs = spark.createDataFrame(
        [(0, 1), (1, 9), (2, 5)], "doc_id long, score long"
    )
    clusters = spark.createDataFrame(
        [(1, "0"), (2, "0")], "doc_id long, cluster_id string"
    )
    kept = sorted(
        r.doc_id
        for r in dedup_apply_best(docs, clusters, score_col="score").collect()
    )
    assert kept == [0, 1]


def test_dedup_apply_best_plans_window_group_limit(spark):
    from xml_to_parquet_spark.functions.dedup import dedup_apply_best

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("score")
    )
    clusters = docs.select(
        "doc_id", (F.col("doc_id") % 10).cast("string").alias("cluster_id")
    )
    plan = (
        dedup_apply_best(docs, clusters, score_col="score")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# URL / domain curation (r5): normalization, domain extraction, per-domain
# caps — web-corpus anti-domination staples.
# ---------------------------------------------------------------------------


def test_normalize_url_and_extract_domain(spark):
    from xml_to_parquet_spark.functions.text import (
        extract_domain,
        normalize_url,
    )

    cases = [
        # tracking params + fragment stripped, case-folded scheme/host,
        # default port dropped, www. stripped — all collapse onto one key
        ("HTTPS://WWW.Example.COM:443/Path/?utm_source=x&q=1#frag",
         "https://example.com/Path/?q=1", "example.com"),
        ("https://example.com/Path/?q=1",
         "https://example.com/Path/?q=1", "example.com"),
        ("http://example.com/a/", "http://example.com/a", "example.com"),
        ("http://www.example.com:80/a", "http://example.com/a",
         "example.com"),
        ("https://sub.other.org/p?fbclid=abc", "https://sub.other.org/p",
         "sub.other.org"),
        # path case preserved; non-default port preserved
        ("https://Example.com:8080/CaseSensitive",
         "https://example.com:8080/CaseSensitive", "example.com"),
        # ADVICE r5: a MID-query tracking param must rejoin its neighbors
        # with '&' — both spellings land on the same dedup key
        ("http://ex.com/p?a=1&utm_source=x&b=2", "http://ex.com/p?a=1&b=2",
         "ex.com"),
        ("http://ex.com/p?a=1&b=2", "http://ex.com/p?a=1&b=2", "ex.com"),
        # leading tracking param hands '?' to the next; tracking-only drops
        ("http://ex.com/p?utm_a=1&utm_b=2&c=3", "http://ex.com/p?c=3",
         "ex.com"),
        ("http://ex.com/p?gclid=z", "http://ex.com/p", "ex.com"),
        # ADVICE r5: default-port strip is scheme-paired — :443 on http
        # and :80 on https are NOT default and must survive
        ("http://ex.com:443/x", "http://ex.com:443/x", "ex.com"),
        ("https://ex.com:80/x", "https://ex.com:80/x", "ex.com"),
        ("not a url", "not a url", None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: (r.nu, r.dom)
        for r in df.select(
            "i",
            normalize_url(F.col("url")).alias("nu"),
            extract_domain(F.col("url")).alias("dom"),
        ).collect()
    }
    for i, (_, want_nu, want_dom) in enumerate(cases):
        assert got[i] == (want_nu, want_dom), (i, got[i])


def test_registrable_domain_psl_subset(spark):
    """PSL eTLD+1 semantics (r7, VERDICT r6 #8): multi-label suffixes
    collapse subdomains; 3-label suffixes beat their embedded 2-label
    suffix; a host that IS a suffix, a single-label host, and a non-URL
    row yield NULL; unknown TLDs fall back to the two-label rule."""
    from xml_to_parquet_spark.functions.text import registrable_domain

    cases = [
        ("https://a.b.example.co.uk/x", "example.co.uk"),
        ("http://example.co.uk/", "example.co.uk"),
        ("https://WWW.Example.CO.UK/y", "example.co.uk"),
        ("http://deep.sub.example.com/p", "example.com"),
        ("http://example.com", "example.com"),
        # 3-label suffix wins over embedded 2-label (act.edu.au > edu.au)
        ("http://school.act.edu.au/", "school.act.edu.au"),
        ("http://x.school.act.edu.au/", "school.act.edu.au"),
        ("http://uni.edu.au/", "uni.edu.au"),
        # k12 state convention
        ("http://lincoln.k12.ca.us/", "lincoln.k12.ca.us"),
        # label ending in a suffix STRING is not a suffix match
        ("http://xco.uk/", "xco.uk"),
        # host IS a public suffix -> no registrable domain
        ("http://co.uk/", None),
        # single-label host
        ("http://localhost/", None),
        # unknown ccTLD -> default two-label rule
        ("http://a.b.example.zz/", "example.zz"),
        ("not a url", None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: r.dom
        for r in df.select(
            "i", registrable_domain(F.col("url")).alias("dom")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_fix_mojibake_deep_rounds_and_idempotence(spark):
    """Multi-round byte-level repair (r8, VERDICT r7 #5): 1-3 rounds of
    UTF-8-as-latin-1/cp1252 corruption all recover exactly; clean text
    (ASCII, legit accents, chars beyond cp1252) is untouched; NULL stays
    NULL; repair is idempotent."""
    from xml_to_parquet_spark.functions.text import (
        corrupt_utf8_py,
        fix_mojibake_deep,
        fix_mojibake_deep_py,
    )

    clean = [
        "plain ascii only",
        "café déjà-vu naïve",
        "quotes “inside” – dash … end",
        "beyond cp1252: Ω λ 中文 🙂",
        "",
    ]
    # pure-Python battery: every corruption depth unwinds exactly
    for s in clean:
        for r in range(4):
            assert fix_mojibake_deep_py(corrupt_utf8_py(s, r)) == s, (s, r)
        assert fix_mojibake_deep_py(fix_mojibake_deep_py(s)) == s
    assert fix_mojibake_deep_py(None) is None
    # cp1252-flavored corruption (punctuation bytes land in the C1 range
    # as real cp1252 characters, not controls) also unwinds
    broken_cp = "cafÃ© â€œqâ€"
    assert fix_mojibake_deep_py(broken_cp) == "café “q”"
    # the Spark kernel matches the pure function row-for-row
    rows = [(i, corrupt_utf8_py(s, r)) for i, (s, r) in enumerate(
        [(s, r) for s in clean for r in range(3)]
    )] + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.fixed
        for r in fix_mojibake_deep(df).collect()
    }
    for i, (_i, t) in enumerate(rows):
        assert got[rows[i][0]] == fix_mojibake_deep_py(rows[i][1])


def test_registrable_domain_full_psl_wildcard_exception_private(spark):
    """Full-PSL semantics (r8, VERDICT r7 #4): wildcard rules (*.ck,
    *.kawasaki.jp) make every single label under them a public suffix;
    exception rules (!www.ck, !city.kawasaki.jp) beat the wildcard and
    ARE the registrable domain; private-section rules (github.io,
    amazonaws.com S3 zones) count as suffixes for capping purposes; and
    the raw host is walked (www is an ordinary label — required for
    !www.ck to ever match)."""
    from xml_to_parquet_spark.functions.text import (
        _load_psl,
        registrable_domain,
    )

    assert _load_psl().source is not None  # the real list, not the subset
    cases = [
        ("https://foo.ck/", None),  # *.ck -> foo.ck IS a public suffix
        ("https://bar.foo.ck/", "bar.foo.ck"),
        ("https://www.ck/", "www.ck"),  # exception beats wildcard
        ("https://sub.www.ck/", "www.ck"),
        ("https://city.kawasaki.jp/", "city.kawasaki.jp"),
        ("https://x.city.kawasaki.jp/", "city.kawasaki.jp"),
        ("https://deep.kawasaki.jp/", None),  # wildcard suffix itself
        ("https://a.deep.kawasaki.jp/", "a.deep.kawasaki.jp"),
        ("https://user.github.io/repo", "user.github.io"),  # private
        ("https://x.user.github.io/", "user.github.io"),
        (
            "https://b.s3.dualstack.ap-northeast-1.amazonaws.com/",
            "b.s3.dualstack.ap-northeast-1.amazonaws.com",  # 5-label rule
        ),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: r.dom
        for r in df.select(
            "i", registrable_domain(F.col("url")).alias("dom")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_cap_per_domain_collapses_subdomains(spark):
    """One 'SEO farm' spreading across subdomains of a multi-label-suffix
    site must still hit the cap as ONE domain."""
    from xml_to_parquet_spark.functions.text import cap_per_domain

    rows = [
        (i, f"https://page{i}.farm.co.uk/p{i}") for i in range(20)
    ] + [(100 + i, f"https://legit{i}.org/x") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = cap_per_domain(df, 5)
    assert capped.count() == 5 + 3  # farm.co.uk capped, legit*.org pass
    farm = capped.filter(F.col("url").contains("farm.co.uk")).count()
    assert farm == 5


def test_cap_per_domain_semantics_and_plan(spark):
    from xml_to_parquet_spark.functions.text import (
        cap_per_domain,
        extract_domain,
    )

    df = spark.createDataFrame(
        [(i, f"https://dom{i % 3}.com/p{i}") for i in range(30)]
        + [(100, "plain text"), (101, "more text")],
        "doc_id long, url string",
    )
    capped = cap_per_domain(df, 5)
    counts = {
        r.d: r["count"]
        for r in capped.groupBy(
            extract_domain(F.col("url")).alias("d")
        ).count().collect()
    }
    # every domain capped at 5; NULL-domain rows pass through uncapped
    assert counts == {"dom0.com": 5, "dom1.com": 5, "dom2.com": 5, None: 2}
    # survivors are deterministic (md5-gate rank): same set on re-run
    first = {r.doc_id for r in capped.select("doc_id").collect()}
    again = {r.doc_id for r in cap_per_domain(df, 5).select("doc_id").collect()}
    assert first == again
    # the rank<=k filter rides row_number — WindowGroupLimit below the
    # exchange, so shuffle volume is <= k rows/domain/map task
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# Substring-level dedup (r6): repeated-k-gram spans + cleaned text.
# ---------------------------------------------------------------------------


def test_repeated_kgram_spans_planted_passages(spark):
    from xml_to_parquet_spark.functions.dedup import (
        repeated_kgram_spans,
        strip_repeated_spans,
    )

    docs = [
        # docs 1+2 share the 4-token passage "license text common block"
        (1, "alpha beta gamma delta unique one license text common block "
            "tail words here"),
        (2, "different start license text common block other ending stuff"),
        (3, "totally unrelated content with no repeats at all whatsoever"),
        # docs 4+5 share a 6-token passage -> three overlapping repeated
        # 4-grams must merge into ONE span of 6 tokens
        (4, "one two three four five six ending alone yes"),
        (5, "prefix bit one two three four five six"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_end): r.n_positions
        for r in repeated_kgram_spans(df, k=4, min_count=2).collect()
    }
    assert spans == {
        (1, 6, 9): 1,
        (2, 2, 5): 1,
        (4, 0, 5): 3,
        (5, 2, 7): 3,
    }

    cleaned = {
        r.doc_id: (r.cleaned_text, r.n_removed)
        for r in strip_repeated_spans(df, k=4, min_count=2).collect()
    }
    assert cleaned[1] == (
        "alpha beta gamma delta unique one tail words here", 4)
    assert cleaned[2] == ("different start other ending stuff", 4)
    assert cleaned[3] == (
        "totally unrelated content with no repeats at all whatsoever", 0)
    assert cleaned[4] == ("ending alone yes", 6)
    assert cleaned[5] == ("prefix bit", 6)


def test_repeated_kgram_spans_within_one_doc(spark):
    """A passage repeated WITHIN a single document is also caught (the
    corpus-wide count makes no distinction)."""
    from xml_to_parquet_spark.functions.dedup import repeated_kgram_spans

    df = spark.createDataFrame(
        [(1, "spam eggs ham toast middle bits spam eggs ham toast")],
        "doc_id long, text string",
    )
    got = [
        (r.span_start, r.span_end, r.n_positions)
        for r in repeated_kgram_spans(df, k=4, min_count=2)
        .orderBy("span_start")
        .collect()
    ]
    assert got == [(0, 3, 1), (6, 9, 1)]


def test_html_to_text_and_title(spark):
    """Element drops (head/script/style/comments), tag stripping, entity
    subset incl. double-encoding, whitespace collapse, and title
    extraction across casing/multiline markup."""
    from xml_to_parquet_spark.functions.text import html_title, html_to_text

    rows = [
        # head dropped entirely (title/meta are chrome, not text)
        (
            0,
            "<html><head><title>T</title><meta x='1'></head>"
            "<body><p>Body text</p></body></html>",
            "Body text",
            "T",
        ),
        # script content with TAGS INSIDE A STRING still dropped whole
        (
            1,
            '<body>keep <SCRIPT type="a">var s="<p>no</p>";</SCRIPT> me',
            "keep me",
            None,
        ),
        # style + comments, multiline, uppercase tags
        (
            2,
            "<BODY><STYLE>\np{color:red}\n</STYLE>a<!-- \n gone -->b",
            "a b",
            None,
        ),
        # entity subset; &amp;lt; must NOT double-decode
        (
            3,
            "<p>x&nbsp;&lt;y&gt; &quot;q&quot; &#39;a&#39; &amp;lt;z</p>",
            "x <y> \"q\" 'a' &lt;z",
            None,
        ),
        # no markup passes through (whitespace-normalized)
        (4, "  plain   text ", "plain text", None),
        # unclosed tag stripped, text kept
        (5, "<p>unclosed", "unclosed", None),
        # multiline title, entity in title
        (
            6,
            "<head><title>\n A &amp;\n B </title></head><p>c</p>",
            "c",
            "A & B",
        ),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _t, _ti in rows], "i int, h string"
    )
    got = {
        r["i"]: (r["txt"], r["ti"])
        for r in df.select(
            "i",
            html_to_text(F.col("h")).alias("txt"),
            html_title(F.col("h")).alias("ti"),
        ).collect()
    }
    for i, _h, want_text, want_title in rows:
        assert got[i] == (want_text, want_title), (i, got[i])


def test_clean_lines_min_words_and_first_occurrence_dedup(spark):
    from xml_to_parquet_spark.functions.text import clean_lines

    rows = [
        # duplicate kept-line drops its SECOND occurrence only
        (0, "a b c\nMenu\na b c\nd e f g", "a b c\nd e f g"),
        # whitespace-normalized lines compare equal for dedup
        (1, "x  y   z\nx y z\nlong enough line", "x y z\nlong enough line"),
        # everything filtered -> empty string
        (2, "one\ntwo words\n", ""),
        # single real line, no newline at all
        (3, "just three words", "just three words"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _w in rows], "i int, t string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", clean_lines(F.col("t")).alias("c")
        ).collect()
    }
    for i, _t, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_clean_lines_exploded_equals_hof(spark, sf_dir):
    """The codegen (posexplode + min-pos dedup) twin must equal the HOF
    column version field-for-field — including NULL text staying NULL and
    fully-filtered docs becoming '' (r8, VERDICT r7 #3)."""
    from xml_to_parquet_spark.functions.text import (
        clean_lines,
        clean_lines_exploded,
    )

    # ids far above the testdata range: clean_lines_exploded groups by
    # doc_id, so the id column must be unique (contract in its docstring)
    fixtures = spark.createDataFrame(
        [
            (9_000_000, "a b c\nMenu\na b c\nd e f g"),
            (9_000_001, "x  y   z\nx y z\nlong enough line"),
            (9_000_002, "one\ntwo words\n"),
            (9_000_003, "just three words"),
            (9_000_004, None),
            (9_000_005, ""),
            (9_000_006, " \t \n  \n"),
        ],
        "doc_id long, text string",
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .unionByName(fixtures)
    )
    hof = docs.select(
        "doc_id", clean_lines(F.col("text"), min_words=3).alias("cleaned")
    )
    exploded = clean_lines_exploded(docs, min_words=3).select(
        "doc_id", "cleaned"
    )
    a = {r["doc_id"]: r["cleaned"] for r in hof.collect()}
    b = {r["doc_id"]: r["cleaned"] for r in exploded.collect()}
    assert a == b
    # plan sanity: no interpreted array HOFs in the exploded variant
    plan = exploded._jdf.queryExecution().executedPlan().toString()
    assert "transform(" not in plan and "filter(lambda" not in plan


def test_mojibake_detect_and_repair(spark):
    """Detection counts only artifact pairs; repair restores the intended
    characters, is idempotent on clean text, and never touches legitimate
    accented text."""
    from xml_to_parquet_spark.functions.text import (
        MOJIBAKE_REPAIRS,
        fix_mojibake,
        mojibake_hits,
    )

    broken = (
        "caf\u00c3\u00a9 \u00e2\u20ac\u0153q\u00e2\u20ac\u009d "
        "isn\u00e2\u20ac\u2122t \u00c2\u00a0x"
    )
    clean = "caf\u00e9 \u201cq\u201d isn\u2019t  x"
    legit = "r\u00e9sum\u00e9 \u00fcber na\u00efve"
    df = spark.createDataFrame(
        [(0, broken), (1, legit), (2, clean)], "i int, t string"
    )
    got = {
        r["i"]: (r["n"], r["f"])
        for r in df.select(
            "i",
            mojibake_hits(F.col("t")).alias("n"),
            fix_mojibake(F.col("t")).alias("f"),
        ).collect()
    }
    assert got[0] == (5, clean)
    assert got[1] == (0, legit)  # real accents untouched
    assert got[2] == (0, clean)  # repair idempotent
    # every marker repairs to its target
    for marker, repaired in MOJIBAKE_REPAIRS:
        row = spark.createDataFrame([(marker,)], "t string").select(
            fix_mojibake(F.col("t")).alias("f"),
            mojibake_hits(F.col("t")).alias("n"),
        ).collect()[0]
        assert row["f"] == repaired and row["n"] >= 1, marker


def test_repeated_kgram_spans_xxhash64_matches_md5(spark):
    """The production hash toggle must produce the identical span set on
    real-shaped data (collisions are a 2^-64-scale event, so any diff is
    a logic bug)."""
    from xml_to_parquet_spark.functions.dedup import repeated_kgram_spans

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rep = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, f"{rep} x {base} y {rep}"),
            (2, f"{base} {base}"),
            (3, "no repeats here at all since tokens differ fully"),
        ],
        "doc_id long, text string",
    )
    a = sorted(
        tuple(r)
        for r in repeated_kgram_spans(docs, hash_mode="md5").collect()
    )
    b = sorted(
        tuple(r)
        for r in repeated_kgram_spans(docs, hash_mode="xxhash64").collect()
    )
    assert a == b and len(a) > 0


def test_exact_dedup_xxhash64_matches_md5(spark):
    from xml_to_parquet_spark.functions.dedup import exact_dedup

    docs = spark.createDataFrame(
        [
            (1, "Same  Doc"),
            (2, "same doc"),  # normalizes equal to 1
            (3, "different entirely"),
            (4, "same doc "),
        ],
        "doc_id long, text string",
    )

    def groups(mode):
        return sorted(
            (r["keep_id"], r["n_copies"])
            for r in exact_dedup(docs, hash_mode=mode).collect()
        )

    assert groups("md5") == groups("xxhash64") == [(1, 3), (3, 1)]


def test_rare_gram_quality_flags_gibberish(spark):
    # 20 copies of the same sentence make its trigrams common; one
    # gibberish doc whose trigrams appear nowhere else must fail the gate
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((100, "zq0vxk9jw2bq7zp4mx8cv1nq6rt3yl5"))
    rows.append((101, "ab"))  # shorter than a trigram: no evidence, passes
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # rare_k sized to the fixture: grams under 1/500 of total are rare
    # (the 20x-repeated sentence's grams sit at ~1/43)
    out = {r.doc_id: r for r in text.rare_gram_quality(df, rare_k=500).collect()}
    assert out[100].pass_gate == 0
    assert out[100].n_rare == out[100].n_tri  # every gram unique -> rare
    assert out[0].pass_gate == 1 and out[0].n_rare == 0
    assert out[101].n_tri == 0 and out[101].pass_gate == 1
    assert out[101].rare_ppm is None
    assert out[100].rare_ppm == 1000000


def test_rare_gram_quality_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = [
        sorted(
            (r.doc_id, r.n_tri, r.n_rare, r.rare_ppm, r.pass_gate)
            for r in text.rare_gram_quality(docs.repartition(p)).collect()
        )
        for p in (1, 7)
    ]
    assert res[0] == res[1]
    assert all(r[1] > 0 for r in res[0])  # real docs all emit grams


def test_gopher_rules_full_battery(spark):
    # One doc per rule violation, plus a clean doc that passes everything.
    clean = (
        "the quick brown fox jumps over that lazy dog and then walks "
        "to the river with grace because every word here is normal "
        "prose and the rhythm keeps mean word length inside bounds "
        "while the sentence keeps going to reach fifty words of "
        "ordinary text that have enough variety to look like real "
        "writing with letters in every single word of it today"
    )
    filler = "the and that have with words keep flowing onward " * 6
    rows = [
        (0, clean),                              # passes all
        (1, "too few words"),                    # fails r_words (short)
        (2, "a " * 300),                         # fails r_mwl (mwl=1)
        (3, filler + "# " * 20),                 # fails r_symbol
        (4, filler + "\n" + "\n".join(f"- item {i}" for i in range(40))),
        (5, filler + "\n" + "\n".join(f"line {i} trails off..." for i in range(40))),
        (6, filler + " ".join("1234" for _ in range(40))),  # fails r_alpha
        (7, ("zork blee quux flarn " * 15)),     # fails r_stop (no stopwords)
        (8, None),                               # NULL text
        (9, ""),                                 # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.gopher_rules(df, min_words=40).collect()}
    assert out[0].passes_gopher == 1
    assert out[1].r_words == 0 and out[1].passes_gopher == 0
    assert out[2].r_mwl == 0 and out[2].r_words == 1
    assert out[3].r_symbol == 0
    assert out[4].r_bullet == 0
    assert out[5].r_ellipsis == 0
    assert out[6].r_alpha == 0
    assert out[7].r_stop == 0 and out[7].r_alpha == 1
    # NULL text: every regexp_count is NULL -> flags NULL -> composite NULL
    assert out[8].passes_gopher is None
    assert out[9].r_words == 0 and out[9].passes_gopher == 0


def test_gopher_rules_matches_oracle_counts(spark):
    # the catalog entry's corpus-splitting claim: both r_words and r_stop
    # vary on the synthetic docs, and the composite is their AND here
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = text.gopher_rules(docs, min_words=30, min_stop_distinct=1)
    agg = out.agg(
        F.sum("r_words").alias("w"),
        F.sum("r_stop").alias("s"),
        F.sum("passes_gopher").alias("p"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert 0 < agg.w < agg.n  # word-count rule splits the corpus
    assert 0 < agg.s < agg.n  # stopword rule splits the corpus
    assert agg.p <= min(agg.w, agg.s)


def _brute_jaccard_pairs(rows, n, t_num, t_den):
    # replay word_shingles semantics: distinct word n-grams, whole text
    # if shorter than n tokens
    import re

    def shingles(s):
        toks = re.sub(r"\s+", " ", s.strip().lower()).split(" ")
        if len(toks) >= n:
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
        return {" ".join(toks)}

    sets = {i: shingles(t) for i, t in rows if t is not None}
    out = []
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * t_den >= t_num * union:
                out.append((a, b, inter, union, inter * 10**6 // union))
    return sorted(out)


def test_setsim_prefix_lossless_vs_bruteforce(spark):
    # pseudo-random docs over a tiny vocabulary force partial overlaps at
    # many different Jaccard levels — the prefix filter must lose NONE
    vocab = ["red", "blue", "green", "gold", "iron", "wolf", "moon", "star"]
    rows = [
        (i, " ".join(vocab[(i * 7 + j * 3) % 8] for j in range(4 + i % 5)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t_num, t_den in [(1, 4), (1, 2), (4, 5), (1, 1)]:
        want = _brute_jaccard_pairs(rows, 3, t_num, t_den)
        got = sorted(
            (r.id_a, r.id_b, r.inter_sz, r.union_sz, r.jacc_ppm)
            for r in dedup.setsim_prefix_pairs(
                df, t_num=t_num, t_den=t_den
            ).collect()
        )
        assert got == want, f"t={t_num}/{t_den}"
    assert len(_brute_jaccard_pairs(rows, 3, 1, 4)) > 5  # non-trivial


def test_setsim_prefix_known_pair_and_partition_invariance(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # high overlap
        (3, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = []
    for p in (1, 5):
        got = [
            (r.id_a, r.id_b, r.inter_sz, r.union_sz)
            for r in dedup.setsim_prefix_pairs(
                df.repartition(p), t_num=1, t_den=2
            ).collect()
        ]
        res.append(got)
    # 9 tokens -> 7 trigrams each; docs 1/2 share 6 (all but the last):
    # union 8, jaccard 6/8 >= 0.5; doc 3 pairs with nothing
    assert res[0] == res[1] == [(1, 2, 6, 8)]


def _winnow_py(t, k, w):
    import hashlib

    hs = [
        int(hashlib.md5(t[p:p + k].encode()).hexdigest()[:8], 16)
        for p in range(len(t) - k + 1)
    ]
    n = len(hs)
    out = set()
    for q in range(max(n - w, 0) + 1):
        win = hs[q:q + min(w, n)]
        m = min(win)
        out.add((q + max(i for i, v in enumerate(win) if v == m), m))
    return out


def test_winnow_matches_python_reference(spark):
    from xml_to_parquet_spark.functions.text import winnow_fingerprints

    texts = [
        (1, "abcdefghijabcdefghij"),   # self-repeating
        (2, "abcdefg"),                # fewer grams than window
        (3, "abcd"),                   # exactly one gram
        (4, "abc"),                    # shorter than k -> nothing
        (5, None),                     # NULL -> nothing
        (6, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=4, w=3).collect():
        got.setdefault(r.id, set()).add((r.pos, r.fp))
    for did, t in texts:
        if t is None or len(t) < 4:
            assert did not in got
        else:
            assert got[did] == _winnow_py(t, 4, 3), did


def test_winnow_shared_substring_guarantee(spark):
    """The MOSS guarantee: documents sharing a substring of length
    >= k + w - 1 share at least one fingerprint HASH."""
    import random

    from xml_to_parquet_spark.functions.text import winnow_fingerprints

    rng = random.Random(11)
    k, w = 5, 4
    shared = "PLAGIARIZEDSPANOFTEXT"  # len 21 >= k + w - 1 = 8
    rows = []
    for i in range(6):
        pre = "".join(rng.choice("abcdefgh") for _ in range(rng.randint(0, 30)))
        post = "".join(rng.choice("stuvwxyz") for _ in range(rng.randint(0, 30)))
        rows.append((i, pre + shared + post))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        fps.setdefault(r.id, set()).add(r.fp)
    common = set.intersection(*(fps[i] for i in range(6)))
    assert common, "shared substring must yield a shared fingerprint"


def test_winnow_density_and_validation(spark):
    import pytest

    from xml_to_parquet_spark.functions.text import winnow_fingerprints

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = winnow_fingerprints(df, k=8, w=4)
    per_doc = {r.id: r.cnt for r in out.groupBy("id").count()
               .withColumnRenamed("count", "cnt").collect()}
    lens = {r.doc_id: r.n_chars for r in df.select("doc_id", "n_chars").collect()}
    for did, c in per_doc.items():
        n_windows = max(lens[did] - 8 + 1 - 4, 0) + 1
        assert 1 <= c <= n_windows
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


def test_winnow_doubling_matches_reference_across_widths(spark):
    """r10 sliding-min rewrite: the sparse-table doubling scheme must
    reproduce the Python reference for EVERY window-width shape — w=1
    (zero rounds, degenerate same-index fold), powers of two (offset 0),
    and non-powers (nonzero tail offset) — on random strings including
    heavy tie density (small alphabet repeats the same gram hashes)."""
    import random

    from xml_to_parquet_spark.functions.text import winnow_fingerprints

    rng = random.Random(20260816)
    texts = []
    did = 0
    for alpha in ("ab", "abcde", "abcdefghijklmnop"):
        for n in (5, 9, 17, 40, 113):
            did += 1
            texts.append(
                (did, "".join(rng.choice(alpha) for _ in range(n)))
            )
    df = spark.createDataFrame(texts, "doc_id long, text string")
    for k, w in [(3, 1), (3, 2), (4, 3), (4, 4), (5, 5), (4, 6), (3, 7)]:
        got = {}
        for r in winnow_fingerprints(df, k=k, w=w).collect():
            got.setdefault(r.id, set()).add((r.pos, r.fp))
        for d, t in texts:
            if len(t) < k:
                assert d not in got, (k, w, d)
            else:
                assert got.get(d, set()) == _winnow_py(t, k, w), (k, w, d)


def test_strip_corpus_duplicate_lines(spark):
    from xml_to_parquet_spark.functions.text import (
        strip_corpus_duplicate_lines,
    )

    hdr = "SHARED HEADER"
    rows = [
        (1, f"{hdr}\nunique one\n\nbody A"),
        (2, f"{hdr}\nunique two\n\nbody B"),
        (3, f"{hdr}\nbody A\nunique three"),  # body A in 2 docs only
        (4, None),
        (5, hdr),  # fully boilerplate → ''
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["cleaned"]
        for r in strip_corpus_duplicate_lines(df, min_df=3).collect()
    }
    # header df=4 >= 3 → dropped everywhere; empty lines exempt (kept);
    # 'body A' df=2 < 3 → kept
    assert got[1] == "unique one\n\nbody A"
    assert got[2] == "unique two\n\nbody B"
    assert got[3] == "body A\nunique three"
    assert got[4] is None
    assert got[5] == ""
    # min_df boundary: at 2, 'body A' goes too
    got2 = {
        r["doc_id"]: r["cleaned"]
        for r in strip_corpus_duplicate_lines(df, min_df=2).collect()
    }
    assert got2[3] == "unique three"
    # within-doc repetition does not inflate document frequency
    df3 = spark.createDataFrame(
        [(1, "x\nx\nx\nkeep"), (2, "other")], "doc_id long, text string"
    )
    got3 = {
        r["doc_id"]: r["cleaned"]
        for r in strip_corpus_duplicate_lines(df3, min_df=2).collect()
    }
    assert got3[1] == "x\nx\nx\nkeep"  # df('x') = 1 document
    # partition invariance
    many = {
        r["doc_id"]: r["cleaned"]
        for r in strip_corpus_duplicate_lines(
            df.repartition(4), min_df=3
        ).collect()
    }
    assert many == got


def _brute_containment_pairs(rows, n, t_num, t_den):
    """Directed containment oracle: (id_a, id_b, inter, sz_a, sz_b,
    ppm) for every ordered pair with |A∩B| * t_den >= t_num * |A|."""
    import re

    def shingles(t):
        toks = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        if len(toks) >= n:
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
        return {" ".join(toks)}

    sets = {i: shingles(t) for i, t in rows if t is not None}
    out = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if len(sets[a]) and inter * t_den >= t_num * len(sets[a]):
                out.append(
                    (a, b, inter, len(sets[a]), len(sets[b]),
                     inter * 10**6 // len(sets[a]))
                )
    return sorted(out)


def test_containment_finds_quote_that_jaccard_misses(spark):
    # the canonical C4 boilerplate case: doc 1 appears VERBATIM inside
    # the much larger doc 2 -> containment(1->2) = 1.0 while Jaccard is
    # ~ |A|/|B| and falls under any usable threshold
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    rows = [
        (1, quote),
        (2, f"{filler} {quote} {filler}"),
        (3, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r.id_a, r.id_b)
        for r in dedup.containment_prefix_pairs(
            df, t_num=4, t_den=5
        ).collect()
    }
    assert (1, 2) in cont          # quote detected, directed
    assert (2, 1) not in cont      # big doc is NOT contained in the quote
    jac = {
        (r.id_a, r.id_b)
        for r in dedup.setsim_prefix_pairs(df, t_num=4, t_den=5).collect()
    }
    assert (1, 2) not in jac       # symmetric Jaccard misses it


def test_containment_prefix_lossless_vs_bruteforce(spark):
    vocab = ["red", "blue", "green", "gold", "iron", "wolf", "moon", "star"]
    rows = [
        (i, " ".join(vocab[(i * 7 + j * 3) % 8] for j in range(4 + i % 5)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t_num, t_den in [(1, 4), (1, 2), (4, 5), (1, 1)]:
        want = _brute_containment_pairs(rows, 3, t_num, t_den)
        got = sorted(
            (r.id_a, r.id_b, r.inter_sz, r.size_a, r.size_b, r.cont_ppm)
            for r in dedup.containment_prefix_pairs(
                df, t_num=t_num, t_den=t_den
            ).collect()
        )
        assert got == want, f"t={t_num}/{t_den}"
    assert len(_brute_containment_pairs(rows, 3, 1, 2)) > 5  # non-trivial


def test_containment_partition_invariance(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "zero alpha beta gamma delta epsilon zeta eta theta iota"),
        (3, "unrelated content lives here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = []
    for p in (1, 7):
        res.append(sorted(
            (r.id_a, r.id_b, r.inter_sz, r.size_a, r.size_b)
            for r in dedup.containment_prefix_pairs(
                df.repartition(p), t_num=1, t_den=1
            ).collect()
        ))
    # doc 1: 2 trigrams, both inside doc 2's 8 -> containment 1.0 even
    # at t=1; the reverse direction (8 into 2) is impossible
    assert res[0] == res[1] == [(1, 2, 2, 2, 8)]


def test_containment_screened_composition(spark):
    """VERDICT r12 item 3: the sketch screen feeding the exact prefix
    join must (a) return exactly the full exact join's pairs on a
    corpus where the screen has perfect recall, and (b) prune >90% of
    the contained-side candidates so the exact join runs survivor-sized
    rather than corpus-sized."""
    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(15))
    rows = [(1, quote), (2, f"{filler} {quote} {filler}")]
    # 98 unique docs contained in nothing (distinct vocab per doc)
    rows += [
        (10 + i, " ".join(f"u{i}t{j}" for j in range(12)))
        for i in range(98)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = sorted(
        (r.id_a, r.id_b, r.inter_sz, r.size_a, r.size_b, r.cont_ppm)
        for r in dedup.containment_prefix_pairs(
            df, t_num=4, t_den=5
        ).collect()
    )
    comp = sorted(
        (r.id_a, r.id_b, r.inter_sz, r.size_a, r.size_b, r.cont_ppm)
        for r in dedup.containment_screened_pairs(
            df, k=16, t_num=4, t_den=5, screen_num=1, screen_den=2
        ).collect()
    )
    assert comp == full
    assert any(p[0] == 1 and p[1] == 2 for p in comp)  # quote detected

    # the screen's survivor set (contained-side candidates the exact
    # join probes) must be a tiny fraction of the corpus
    survivors = (
        dedup.containment_sketch_pairs(
            df, k=16, t_num=1, t_den=2
        ).select("id_a").distinct().count()
    )
    assert survivors <= len(rows) // 10, survivors

    # a screen threshold at or above the exact threshold has no noise
    # margin and is a caller error
    with pytest.raises(ValueError, match="BELOW"):
        dedup.containment_screened_pairs(
            df, t_num=4, t_den=5, screen_num=4, screen_den=5
        )


def _skewed_boiler_corpus(spark):
    """~40 docs that all share an 8-word boilerplate footer (hot
    shingles, df ≈ corpus size) plus 3 footer-only docs whose rarest-
    token prefix is ALL hot shingles — the pa_hot population."""
    boiler = "all rights reserved worldwide forever and ever amen"
    rows = [
        (i, " ".join(f"c{i}w{j} d{i}x{j}" for j in range(8)) + " " + boiler)
        for i in range(40)
    ]
    rows += [(100 + i, boiler) for i in range(3)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_hot_cold_split_lossless(spark):
    """r13 skew hardening: hot_df_cap must be a pure plan change —
    identical rows to the unsplit join AND to the brute-force oracle on
    a corpus where the hot branch carries real pairs (the footer-only
    docs are contained in EVERY doc via hot shingles alone)."""
    rows, df = _skewed_boiler_corpus(spark)
    want = _brute_containment_pairs(rows, 3, 4, 5)
    unsplit = sorted(
        (r.id_a, r.id_b, r.inter_sz, r.size_a, r.size_b, r.cont_ppm)
        for r in dedup.containment_prefix_pairs(df, t_num=4, t_den=5)
        .collect()
    )
    split = sorted(
        (r.id_a, r.id_b, r.inter_sz, r.size_a, r.size_b, r.cont_ppm)
        for r in dedup.containment_prefix_pairs(
            df, t_num=4, t_den=5, hot_df_cap=10
        ).collect()
    )
    assert split == unsplit == want
    # the hot branch is doing real work: every footer-only doc pairs
    # with every boilerplate-carrying doc, and those pairs can only
    # arrive via hot shingles (the footer docs HAVE no cold shingles)
    hot_pairs = [p for p in split if p[0] >= 100]
    assert len(hot_pairs) >= 3 * 40


def test_containment_hot_branch_is_broadcast_no_cartesian(spark):
    _, df = _skewed_boiler_corpus(spark)
    plan = (
        dedup.containment_prefix_pairs(df, t_num=4, t_den=5, hot_df_cap=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the hot candidate arm and the four hot/cold splitters are
    # broadcast joins; at least one must survive whatever AQE does
    assert "BroadcastHashJoin" in plan


def test_containment_hot_cap_above_all_df_is_noop(spark):
    # cap above every shingle's df -> empty hot arm, same rows
    rows, df = _skewed_boiler_corpus(spark)
    base = sorted(
        (r.id_a, r.id_b)
        for r in dedup.containment_prefix_pairs(df, t_num=4, t_den=5)
        .collect()
    )
    capped = sorted(
        (r.id_a, r.id_b)
        for r in dedup.containment_prefix_pairs(
            df, t_num=4, t_den=5, hot_df_cap=10**6
        ).collect()
    )
    assert capped == base


def test_containment_hot_cold_split_composes_with_contained_ids(spark):
    # the screen->exact hook and the skew split are orthogonal knobs;
    # restricting the contained side must not disturb hot losslessness
    rows, df = _skewed_boiler_corpus(spark)
    ids = spark.createDataFrame([(100,), (101,), (5,)], "id long")
    got = sorted(
        (r.id_a, r.id_b)
        for r in dedup.containment_prefix_pairs(
            df, t_num=4, t_den=5, contained_ids=ids, hot_df_cap=10
        ).collect()
    )
    want = sorted(
        (a, b)
        for (a, b, *_rest) in _brute_containment_pairs(rows, 3, 4, 5)
        if a in (100, 101, 5)
    )
    assert got == want


def test_fuzzy_pairs_warns_deprecated(spark):
    docs = spark.createDataFrame(
        [(1, "kitten"), (2, "sitten")], "doc_id long, text string"
    )
    with pytest.warns(DeprecationWarning, match="fuzzy_pairs"):
        dedup.fuzzy_pairs(docs, "text", max_distance=1)


def test_simhash_pairs_auto_checkpoints_only_needed_columns(spark):
    # ADVICE r12: the count-path checkpoint must materialize only
    # (id, text), not every input column — pinned functionally: a wide
    # input with payload columns produces the same pairs as the slim
    # input, and the checkpointed plan the operator builds on carries
    # exactly the two columns it reads
    slim = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        "doc_id long, text string",
    )
    wide = slim.withColumn("payload", F.repeat(F.lit("x"), 1000)) \
               .withColumn("meta", F.lit("m"))
    want = sorted(
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs_auto(slim, max_hamming=3).collect()
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs_auto(wide, max_hamming=3).collect()
    )
    assert got == want and (1, 2) in got


def test_simhash_pairs_auto_n_docs_hint_identical_and_countless(spark):
    # ADVICE r11: the width-selection count double-computed expensive
    # upstream plans. The n_docs hint must skip the count entirely
    # (pinned by counting jobs via the status tracker) and produce the
    # identical pair set.
    docs = _docs(spark)
    n = docs.count()
    base = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_pairs_auto(docs, max_hamming=3).collect()
    }
    sc = spark.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    hinted_df = dedup.simhash_pairs_auto(docs, max_hamming=3, n_docs=n)
    after = sc.statusTracker().getJobIdsForGroup(None)
    # plan construction with the hint runs ZERO jobs (no count, no
    # eager checkpoint) — dispatch is pure arithmetic on n_docs
    assert list(before) == list(after)
    hinted = {(r.id_a, r.id_b, r.hamming) for r in hinted_df.collect()}
    assert hinted == base


def test_containment_dedup_apply_drops_contained_keeps_container(spark):
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    rows = [
        (1, quote),                              # contained in 2 -> drop
        (2, f"{filler} {quote} {filler}"),       # container -> keep
        (3, "completely different words entirely here now"),  # keep
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r.doc_id
        for r in dedup.containment_dedup_apply(df, t_num=4, t_den=5).collect()
    )
    assert kept == [2, 3]


def test_containment_dedup_apply_mutual_keeps_one(spark):
    # near-identical docs contain each other; the strictly-greater rule
    # (size desc, id asc) must keep exactly one representative, never
    # delete both
    t = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(7, t), (9, t)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r.doc_id
        for r in dedup.containment_dedup_apply(df, t_num=1, t_den=1).collect()
    )
    assert kept == [7]  # equal sizes: smaller id survives


def test_containment_dedup_apply_partition_invariant(spark):
    rows = [
        (1, "a b c d e f"),
        (2, "x0 a b c d e f x1 x2 x3 x4 x5 x6 x7 x8"),
        (3, "unrelated content entirely"),
        (4, "x0 a b c d e f x1 x2 x3 x4 x5 x6 x7 x8"),  # dup of 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = []
    for p in (1, 8):
        res.append(sorted(
            r.doc_id
            for r in dedup.containment_dedup_apply(
                df.repartition(p), t_num=4, t_den=5
            ).collect()
        ))
    assert res[0] == res[1] == [2, 3]  # 1 contained; 4 loses tie to 2


def _py_containment_sketch(rows, n=3, k=16, t_num=4, t_den=5):
    """Python replay of the deterministic bottom-k estimator — same
    md5 32-bit hash, same (h, shingle) tie-break, same collision fold."""
    import hashlib
    import re

    def shingles(t):
        toks = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        if len(toks) >= n:
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
        return {" ".join(toks)}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    sets = {i: shingles(t) for i, t in rows}
    hsets = {i: {h32(s) for s in sets[i]} for i in sets}
    out = []
    for a in sorted(sets):
        sk = sorted(((h32(s), s) for s in sets[a]))[:k]
        sk_a = len(sk)
        for b in sorted(sets):
            if a == b:
                continue
            m = sum(1 for h, _ in sk if h in hsets[b])
            if sk_a and m * t_den >= t_num * sk_a:
                out.append((a, b, m, sk_a, m * 10**6 // sk_a))
    return sorted(out)


def test_containment_sketch_matches_python_replay(spark):
    vocab = ["red", "blue", "green", "gold", "iron", "wolf", "moon", "star"]
    rows = [
        (i, " ".join(vocab[(i * 7 + j * 3) % 8] for j in range(4 + i % 6)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (4, 16):
        want = _py_containment_sketch(rows, k=k)
        got = sorted(
            (r.id_a, r.id_b, r.m, r.sk_a, r.cont_est_ppm)
            for r in dedup.containment_sketch_pairs(
                df, k=k, t_num=4, t_den=5
            ).collect()
        )
        assert got == want, f"k={k}"
    assert len(_py_containment_sketch(rows, k=16)) > 0


def test_containment_sketch_always_finds_full_containment(spark):
    # C(A->B) = 1.0 means EVERY shingle of A is in B, so every sampled
    # shingle is too: m == sk_a and the pair is found at any threshold
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    rows = [(1, quote), (2, f"{filler} {quote} {filler}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.m, r.sk_a)
        for r in dedup.containment_sketch_pairs(
            df, k=4, t_num=1, t_den=1
        ).collect()
    }
    assert (1, 2) in got
    m, sk = got[(1, 2)]
    assert m == sk  # every sampled shingle present in the container


def test_containment_sketch_small_doc_sketch_is_exact(spark):
    # |A| <= k: the sketch IS the shingle set, est = exact containment
    rows = [(1, "a b c d"), (2, "z0 a b c d z1 z2 z3 z4 z5")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.id_a, r.id_b, r.m, r.sk_a)
        for r in dedup.containment_sketch_pairs(
            df, k=64, t_num=1, t_den=1
        ).collect()
    ]
    # doc 1 has 2 trigrams, both in doc 2
    assert got == [(1, 2, 2, 2)]


def test_chunk_documents_boundary_contract(spark):
    from xml_to_parquet_spark.functions.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(
        df, chunk_tokens=4, overlap_tokens=1
    ).collect()
    # stride 3: starts 0,3,6 cover tokens 0..9 (last chunk 6..9)
    assert [(r.chunk_idx, r.tok_start, r.chunk_len) for r in rows] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4),
    ]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"
    assert rows[2].chunk_text == "t6 t7 t8 t9"
    assert all(r.n_chunks == 3 for r in rows)
    # every token covered exactly via starts/lens
    covered = set()
    for r in rows:
        covered |= set(range(r.tok_start, r.tok_start + r.chunk_len))
    assert covered == set(range(10))


def test_chunk_documents_short_and_empty_docs(spark):
    from xml_to_parquet_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_documents(df, chunk_tokens=8, overlap_tokens=2)
        .collect()
    }
    assert len(rows) == 3  # one chunk per doc, empties included
    assert rows[(1, 0)].chunk_text == "only three tokens"
    assert rows[(1, 0)].chunk_len == 3
    assert rows[(2, 0)].chunk_text == "" and rows[(2, 0)].chunk_len == 0
    assert rows[(3, 0)].chunk_text == ""


def test_chunk_documents_tail_never_dangles(spark):
    """The last chunk must always end at the final token, and every
    chunk past the first must start exactly stride tokens later."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.functions.text import chunk_documents

    df = spark.range(1, 40).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, CAST(id AS INT)), "
            "i -> concat('w', i)), ' ')"
        ).alias("text"),
    )
    out = chunk_documents(df, chunk_tokens=7, overlap_tokens=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = doc_id  # doc i has i tokens
        last = chunks[-1]
        assert last.tok_start + last.chunk_len == n
        for a, b in zip(chunks, chunks[1:]):
            assert b.tok_start - a.tok_start == 4  # stride
            assert b.chunk_len >= 1


def test_chunk_documents_validates_overlap(spark):
    import pytest

    from xml_to_parquet_spark.functions.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)
