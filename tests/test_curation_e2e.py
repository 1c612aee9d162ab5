"""End-to-end training-data curation pipeline: the scale extensions are
not isolated demos — this test composes them the way a production corpus
build does and asserts the cross-stage invariants:

    quality gate → PII scrub → exact dedup → MinHash/LSH near-dup
    clustering → keep-best retention → deterministic split assignment →
    sequence packing

Every stage is a DataFrame→DataFrame function, so the whole pipeline is
ONE lazy plan until the final assertion collects.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.functions.dedup import (
    dedup_apply_best,
    dedup_clusters_star,
    exact_dedup,
    minhash_lsh_candidates,
)
from xml_to_parquet_spark.functions.sampling import (
    assign_split,
    pack_sequences,
)
from xml_to_parquet_spark.functions.text import (
    quality_gate,
    scrub_pii,
    token_count,
)

def _doc(i: int, n: int = 40) -> str:
    """Per-doc DISTINCT token stream — docs share no shingles, so the
    near-dup stages only fire where the fixture plants duplicates."""
    return " ".join(f"tok{i}x{j * j % 97}v{j}" for j in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 20 clean docs, pairwise-disjoint content
    for i in range(20):
        rows.append((i, _doc(i)))
    # exact duplicates of docs 0..2 (ids 100..102)
    for i in range(3):
        rows.append((100 + i, _doc(i)))
    # near-duplicates of docs 3..5: same stream, one token edited and one
    # appended (ids 203..205 — longer, so keep-best must prefer them)
    for i in range(3, 6):
        rows.append((200 + i, _doc(i).replace("v7 ", "v7edit ") + " extra"))
    # junk: too short / repetitive / pii-laden
    rows.append((300, "tiny"))
    rows.append((301, "spam spam spam spam spam spam spam spam spam spam"))
    rows.append(
        (302, _doc(99) + " contact someone@example.com and someone@example.com")
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_pipeline_composes(spark, corpus):
    # 1. quality gate: drops the short + repetitive docs with named reasons
    gate = quality_gate(corpus, min_tokens=10, max_dup_token_frac=0.5)
    reasons = {r.doc_id: r.drop_reason for r in gate.collect()}
    assert reasons[300] == "too_short"
    assert reasons[301] in ("too_repetitive", "bigram_spam")
    kept = corpus.join(
        gate.filter(F.col("keep")).select("doc_id"), on="doc_id"
    )

    # 2. PII scrub rewrites emails but keeps the row
    scrubbed = scrub_pii(kept).withColumnRenamed("scrubbed_text", "text")
    pii_row = scrubbed.filter(F.col("doc_id") == 302).collect()
    assert pii_row and "<EMAIL>" in pii_row[0].text
    assert "someone@example.com" not in pii_row[0].text
    assert pii_row[0].n_email == 2  # counted before scrubbing

    # 3. exact dedup: the 3 byte-identical copies collapse onto min id
    fp = exact_dedup(scrubbed)
    dup_groups = fp.filter(F.col("n_copies") > 1).collect()
    assert {r.keep_id for r in dup_groups} == {0, 1, 2}
    survivors = scrubbed.join(
        fp.select(F.col("keep_id").alias("doc_id")), on="doc_id"
    )

    # 4. near-dup: LSH candidates -> exact-CC clusters -> keep best
    # (score = token count, so the longer near-dup variant wins)
    cands = minhash_lsh_candidates(survivors).select("id_a", "id_b")
    clusters = dedup_clusters_star(cands)
    scored = survivors.withColumn("score", token_count(F.col("text")))
    final = dedup_apply_best(scored, clusters, score_col="score")
    ids = {r.doc_id for r in final.select("doc_id").collect()}
    # each near-dup pair (i, 200+i) keeps exactly the longer 200+i variant
    for i in range(3, 6):
        assert 200 + i in ids and i not in ids
    # untouched clean docs all survive
    assert set(range(6, 20)) <= ids

    # 5. deterministic split: disjoint, exhaustive, engine-invariant
    split = assign_split(
        final, "doc_id", fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    per = {r.doc_id: r.split for r in split.select("doc_id", "split").collect()}
    assert set(per) == ids and set(per.values()) <= {"train", "val", "test"}

    # 6. sequence packing over the train split: offsets are an exclusive
    # prefix sum in id order and chunks cover every token exactly once
    train = split.filter(F.col("split") == "train").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    packed = pack_sequences(train, budget=64).orderBy("doc_id").collect()
    offset = 0
    for r in packed:
        assert r.start_offset == offset
        assert r.start_chunk == offset // 64
        offset += r.n_tokens
        assert r.end_chunk == (offset - 1) // 64
    assert offset == sum(r.n_tokens for r in packed)
