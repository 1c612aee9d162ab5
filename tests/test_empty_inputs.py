"""Empty-input behavior: curation operators must return empty results (not
errors) on empty frames — the day-one state of any incremental pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.functions import dedup, sampling, similarity, text


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_empty_docs_through_curation_ops(spark):
    e = _empty_docs(spark)
    assert dedup.exact_dedup(e).count() == 0
    assert dedup.minhash_lsh_candidates(e).count() == 0
    assert text.repetition_features(e).count() == 0
    assert text.quality_gate(e).count() == 0
    assert text.scrub_pii(e).count() == 0
    assert sampling.hash_sample(e, "doc_id", 0.5).count() == 0
    assert sampling.assign_split(e, "doc_id").count() == 0


def test_empty_pairs_clustering(spark):
    e = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.dedup_clusters(e, iterations=2).count() == 0
    assert dedup.dedup_clusters_star(e).count() == 0


def test_empty_embeddings_ops(spark):
    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.embedding_neardup_pairs(e).count() == 0
    assert similarity.cosine_topk(e, query_ids=[0]).count() == 0


def test_empty_packing(spark):
    e = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert sampling.pack_sequences(e, budget=128).count() == 0


@pytest.mark.filterwarnings("ignore::DeprecationWarning")
def test_empty_fuzzy_matching(spark):
    # intentional deprecated-path coverage (ADVICE r11 hygiene): the
    # legacy entry point must stay empty-safe until its removal round
    e = _empty_docs(spark)
    assert dedup.fuzzy_pairs(e, "text").count() == 0
    assert dedup.fuzzy_pairs_qgram(e, "text", num_partitions=4).count() == 0
    assert dedup.fuzzy_pairs_symdel(e, "text", num_partitions=4).count() == 0


def test_kmeans_empty_raises_clear_error(spark):
    import pytest

    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no seed vectors"):
        similarity.kmeans_assign_quantized(e, k=4)


def test_empty_url_ops(spark):
    e = spark.createDataFrame([], "doc_id long, url string")
    assert text.cap_per_domain(e, 5).count() == 0
    assert (
        e.select(
            text.normalize_url(F.col("url")),
            text.extract_domain(F.col("url")),
        ).count()
        == 0
    )
    # NULL url rows: normalize passes null through, domain is null,
    # cap keeps them (singleton keys)
    one = spark.createDataFrame([(1, None)], "doc_id long, url string")
    row = one.select(
        text.normalize_url(F.col("url")).alias("nu"),
        text.extract_domain(F.col("url")).alias("d"),
    ).collect()[0]
    assert row.nu is None and row.d is None
    assert text.cap_per_domain(one, 1).count() == 1


def test_empty_sketches_and_retrieval(spark):
    from xml_to_parquet_spark.functions import graph, retrieval, sketches

    toks = spark.createDataFrame([], "lang string, token string")
    assert sketches.kmv_distinct(toks, "token", ["lang"]).count() == 0
    assert sketches.hll_distinct(toks, "token", ["lang"]).count() == 0
    bare = spark.createDataFrame([], "token string")
    assert sketches.countmin_sketch(bare).count() == 0
    # an empty build side is a valid (all-zero) Bloom filter: every
    # probe must come back False, never error
    bm = sketches.bloom_bitmap(
        spark.createDataFrame([], "key string"), "key", m=256, k=2
    )
    assert set(bm) == {"0"}
    probe = spark.createDataFrame([("x",)], ["key"])
    row = probe.select(
        sketches.bloom_might_contain(F.col("key"), bm, m=256, k=2).alias("h")
    ).collect()[0]
    assert row["h"] is False

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert retrieval.bm25_topk(docs, ["cat"], k=5).count() == 0

    edges = spark.createDataFrame([], "src string, dst string, weight long")
    assert graph.pagerank(edges, iterations=2).count() == 0


def test_empty_leakage_split_and_dsir(spark):
    from xml_to_parquet_spark.functions import sampling

    docs = spark.createDataFrame([], "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert sampling.leakage_safe_split(docs, pairs).count() == 0
    assert (
        sampling.dsir_scores(docs, target_pred=F.lit(True)).count() == 0
    )


def test_empty_inputs_r8_additions(spark):
    from xml_to_parquet_spark.functions.association import pmi_pairs
    from xml_to_parquet_spark.functions.drift import (
        bucket_anomalies,
        frequency_drift,
        ngram_diversity,
    )
    from xml_to_parquet_spark.functions.graph import bfs_levels, triangle_counts
    from xml_to_parquet_spark.functions.sampling import k_anonymize
    from xml_to_parquet_spark.functions.text import gopher_rules

    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    assert gopher_rules(docs).count() == 0
    assert pmi_pairs(docs).count() == 0
    assert ngram_diversity(docs).count() == 0
    assert k_anonymize(docs, ["source"]).count() == 0
    toks = spark.createDataFrame([], "token string, source string")
    assert frequency_drift(toks, "source", "a", "b").count() == 0
    ev = spark.createDataFrame([], "ts timestamp, event_type string")
    assert bucket_anomalies(ev).count() == 0
    edges = spark.createDataFrame([], "src long, dst long")
    assert triangle_counts(edges).count() == 0
    # BFS over an empty graph: seeds reach nothing, no level rows
    assert bfs_levels(edges, [1, 2]).count() == 0


def test_empty_inputs_r9_additions(spark):
    from xml_to_parquet_spark.operators.aggregation import event_transitions

    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, event_type string"
    )
    assert event_transitions(ev).count() == 0

    from xml_to_parquet_spark.functions.sampling import chunk_documents

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert chunk_documents(docs).count() == 0

    from xml_to_parquet_spark.functions.association import (
        skipgram_cooccurrence,
    )
    from xml_to_parquet_spark.functions.text import winnow_fingerprints

    assert skipgram_cooccurrence(docs).count() == 0
    assert winnow_fingerprints(docs).count() == 0

    from xml_to_parquet_spark.functions.retrieval import (
        phrase_query,
        positional_postings,
    )

    assert phrase_query(positional_postings(docs), ["a", "b"]).count() == 0

    from xml_to_parquet_spark.functions.retrieval import (
        more_like_this,
        near_query,
    )

    assert near_query(positional_postings(docs), "a", "b").count() == 0
    assert more_like_this(docs, query_ids=[0]).count() == 0
