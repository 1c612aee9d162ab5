"""Similarity search over embedding columns (array<float>).

- cosine_topk:      brute-force exact top-k for a set of query vectors.
                    Query set is broadcast; each partition scores its slice
                    of the corpus and per-partition top-k merges via a
                    rank-window — O(corpus × queries) compute, no corpus
                    shuffle until the tiny ranked output.
- lsh_bucket_topk:  the scale path — random-hyperplane (sign) LSH buckets
                    shrink the candidate set, then exact cosine re-ranks
                    within buckets. Hyperplane components are derived from
                    md5 hashes (deterministic; no stored model).

Dot products stay JVM-side via zip_with + aggregate (sequential fold over
the array — deterministic order). Output contract returns (query, neighbor,
rank) — ranks, not raw floats, so engine-level ulp noise can't break
hash-comparison; ties break on neighbor id.

Pattern references (see PAPERS.md): distributed top-k similarity search
with per-partition pruning + merge (REPOSE, ICDE 2021; incremental top-k,
EDBT 2020) — our rank-window-over-partitioned-scores is the DataFrame
rendering of the same per-partition top-k + global merge shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic per element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), l2norm(a) * l2norm(b))


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Returns (query_id, neighbor_id, rank). The query side is a broadcast of
    |Q| rows; corpus is scanned once. rank = row_number ordered by
    (cosine desc, neighbor_id asc) — fully deterministic.
    """
    # norms are precomputed per row BEFORE the |corpus|×|queries| join, so
    # per-pair work is one dot product — at scale this halves the flops and
    # is how a normalized-embedding store would behave
    base = df.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("v")
    ).withColumn("nrm", l2norm(F.col("v")))
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos",
            F.try_divide(dot(F.col("qv"), F.col("v")), F.col("qnrm") * F.col("nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "rank"
        )
    )


def hyperplane_component(plane: Column, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    md5(plane:dim) first 8 hex digits / 2^32 - 0.5. No stored model — any
    executor can regenerate any component."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", plane, dim)), 1, 8), 16, 10
    ).cast("double")
    return h / F.lit(float(1 << 32)) - F.lit(0.5)


def lsh_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id: bit p = (v · hyperplane_p) >= 0."""
    def plane_bit(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda i: hyperplane_component(F.lit(p), i),
                ),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))

    bucket = None
    for p in range(n_planes):
        bucket = plane_bit(p) if bucket is None else bucket + plane_bit(p)
    return bucket.cast("int")


def lsh_bucket_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within the query's LSH bucket.

    The corpus is scored once into buckets (linear scan, no shuffle), then
    only same-bucket candidates join each query — at scale this cuts the
    candidate set by ~2^n_planes while the bucket assignment stays a pure
    map. Recall is tunable via n_planes (fewer planes = bigger buckets =
    higher recall).
    """
    base = df.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), n_planes))
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        base.join(
            F.broadcast(queries), on=F.col("bucket") == F.col("qbucket")
        )
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    centroid cells, search only the ``n_probe`` cells nearest each query.

    Centroids here are hash-seeded (the first ``n_centroids`` vectors by id)
    so the whole index build is deterministic and SQL-expressible — a
    production build would Lloyd-iterate the centroids (each iteration is
    one groupBy-average over the assignment), which changes recall, not the
    plan shape below.

    Plan shape (the part that matters at 100 TB):
    - centroids are broadcast; cell assignment is a map-side argmax over
      n_centroids cosines — a single linear scan of the corpus, no shuffle;
    - the probe join hits only ~(n_probe / n_centroids) of the corpus per
      query instead of all of it (brute force = cosine_topk);
    - exact cosine re-ranks inside the probed cells; ranks are returned, so
      float ulp noise can't break result comparison.
    """
    base = df.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("v")
    )
    cents = base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col("v").alias("cv")
    )

    def nearest_cells(side: DataFrame, n: int, out_id: str) -> DataFrame:
        scored = side.crossJoin(F.broadcast(cents)).withColumn(
            "cos_c", cosine(F.col("v"), F.col("cv"))
        )
        w = Window.partitionBy(side[id_col]).orderBy(
            F.col("cos_c").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
            .select(
                F.col(id_col).alias(out_id), F.col("v"), F.col("centroid_id")
            )
        )

    assigned = nearest_cells(base, 1, "corpus_id")
    qprobe = nearest_cells(
        base.filter(F.col(id_col).isin(query_ids)), n_probe, "query_id"
    ).select("query_id", F.col("v").alias("qv"), "centroid_id")

    scored = (
        assigned.join(F.broadcast(qprobe), on="centroid_id")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("corpus_id").alias("neighbor_id"), "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    Exact all-pairs via BLOCK MATMUL: the normalized corpus matrix is
    broadcast once; each partition multiplies its row block against it with
    a single numpy gemm inside mapInPandas (Arrow-batched). Per-pair cost is
    one fused multiply — ~100× the higher-order-function expression path.

    Scale: broadcast works while N×dim×8B fits in executor memory (~1.5 GB
    at 1M×192d). Beyond that, tile BOTH sides: cross-join block ids, gemm
    per block pair — same kernel, bounded memory. For sparse near-dup needs,
    filter candidates with lsh_bucket first.
    """
    import numpy as np
    import pandas as pd

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    rows = base.collect()  # broadcast side — see scale note above
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]

    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(matn)

    def _block(batches):
        all_ids = b_ids.value
        corpus = b_mat.value
        for pdf in batches:
            block = np.array(list(pdf["v"]), dtype=np.float64)
            bn = np.sqrt((block * block).sum(axis=1))
            bn[bn == 0] = 1.0
            block = block / bn[:, None]
            sims = block @ corpus.T  # one gemm for the whole batch
            bids = pdf["id"].to_numpy()
            out_a, out_b = [], []
            for r in range(sims.shape[0]):
                hits = np.where(sims[r] >= threshold)[0]
                for c in hits:
                    if all_ids[c] > bids[r]:
                        out_a.append(bids[r])
                        out_b.append(all_ids[c])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return (
        base.mapInPandas(_block, "id_a long, id_b long")
        .orderBy("id_a", "id_b")
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-label elementwise centroid over an array<float> column — the
    class-prototype / cluster-update step of embedding pipelines.

    Exactness strategy: float sums are order-dependent, so each component is
    quantized to an integer first — ``floor(v * quant + 0.5)`` — and summed
    as BIGINT (exact, commutative, partitioning-invariant); the centroid is
    recovered as sum/(quant·n). float→double widening, the multiply, and
    floor are all IEEE-deterministic, so every engine agrees bit-for-bit
    (plain float→decimal casts do NOT agree: Spark converts via the
    shortest decimal repr, DuckDB via binary expansion).

    Scale shape: posexplode is map-side (rows × dim), but map-side partial
    aggregation collapses each task's output to |labels|·dim rows before
    the single shuffle — shuffle bytes are independent of corpus size.

    Returns (label, pos, n, sum_q, centroid) — one row per label × dimension.
    """
    q = (
        df.select(
            F.col(label_col).alias("label"),
            F.posexplode(vec_col).alias("pos", "v"),
        )
        .withColumn(
            "vq",
            F.floor(F.col("v").cast("double") * F.lit(float(quant)) + F.lit(0.5))
            .cast("long"),
        )
        .groupBy("label", "pos")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vq").alias("sum_q"))
    )
    return q.select(
        "label",
        "pos",
        "n",
        "sum_q",
        (F.col("sum_q").cast("double") / F.lit(float(quant)) / F.col("n")).alias(
            "centroid"
        ),
    )
