"""Empty-input behavior: curation operators must return empty results (not
errors) on empty frames — the day-one state of any incremental pipeline."""

from __future__ import annotations

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


def test_empty_fuzzy_matching(spark):
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
