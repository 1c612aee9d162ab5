"""BM25 full-text retrieval, integer-exact across engines.

The reference has no retrieval surface; for a training-data pipeline,
query-targeted selection ("pull the documents most relevant to this
probe set") is a first-class operation — and the published BM25 ranking
function (Robertson et al., Okapi; the Lucene idf variant
``ln(1 + (N - df + 0.5)/(df + 0.5))``) is its standard form.

Everything here is re-expressed in BIGINT fixed point so Spark and the
DuckDB oracle produce bit-identical scores:

- **log2 without floats**: ``ilog2_1024(x) = L*1024 + ((x*1024) >> L)
  - 1024`` where L is the MSB index read off ``hex(x)`` (both engines
  print uppercase hex with no leading zeros, verified) — the classic
  linear-mantissa approximation, *strictly monotone*, max error 0.086
  bits. Natural-vs-base-2 log only rescales every idf by the same
  constant, which BM25's ranking is invariant to.
- **idf**: ``ilog2_1024(((2N + 2) << 20) // (2df + 1)) - 20*1024`` —
  the <<20 pre-scale keeps 10 true fractional bits through the integer
  division; always positive (the Lucene variant never goes negative, so
  no clamp branch to disagree on).
- **tf normalization** (k1 = 1.2, b = 0.75): multiply through by
  40·avgdl to clear the rationals:
  ``tfn = (88·tf·avgdl·10^4) // (40·tf·avgdl + 12·avgdl + 36·dl)``.
- ``score = Σ_terms idf_1024 · tfn`` — per-term product ≤ ~2^31, sums
  far below 2^63.

Scale shape: the only corpus-sized work is one token scan feeding (a)
the per-doc length agg and (b) the tf agg *pre-filtered to the query
terms* (an IN-list that pushes into the scan); the df/avgdl tables are
query-sized / 1-row and broadcast. At production scale the dl and
postings tables are published once (sinks/publish.py) and reused per
query — the plan here is the index-free one-shot form of the same math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BM25_SCALE = 10_000  # tf-normalization fixed point
IDF_PRESHIFT = 20  # fractional bits carried through the idf division


def _msb_case(ch: str) -> str:
    """Bits below the MSB within a single uppercase hex digit ``ch``
    (SQL expr). Lexicographic compare is numeric for '1'-'9','A'-'F'."""
    return (
        f"CASE WHEN {ch} >= '8' THEN 3 WHEN {ch} >= '4' THEN 2 "
        f"WHEN {ch} >= '2' THEN 1 ELSE 0 END"
    )


def ilog2_1024_spark(col: str) -> str:
    """Spark-SQL expression: strictly monotone fixed-point log2 of a
    POSITIVE bigint column ``col`` (values must stay < 2^53 so the
    mantissa multiply cannot overflow)."""
    L = (
        f"((length(hex({col})) - 1) * 4 + "
        f"{_msb_case(f'substring(hex({col}), 1, 1)')})"
    )
    return (
        f"({L} * 1024 + shiftright({col} * 1024, cast({L} AS int)) - 1024)"
    )


def ilog2_1024_duck(col: str) -> str:
    """DuckDB twin of :func:`ilog2_1024_spark` (>> in place of
    shiftright; hex() agrees byte-for-byte, verified in-container)."""
    L = (
        f"((length(hex({col})) - 1) * 4 + "
        f"{_msb_case(f'substr(hex({col}), 1, 1)')})"
    )
    return f"({L} * 1024 + (({col} * 1024) >> {L}) - 1024)"


def ilog2_1024_py(x: int) -> int:
    """Python reference for tests."""
    if x <= 0:
        raise ValueError("ilog2 of non-positive value")
    L = x.bit_length() - 1
    return L * 1024 + ((x * 1024) >> L) - 1024


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under integer BM25.

    Returns (id, bm25_fp, n_terms_hit) ordered by (bm25_fp DESC, id) —
    deterministic, partitioning-invariant, exactly replayable in SQL.
    """
    from xml_to_parquet_spark.functions.text import norm_text

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("token"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    ).select(
        "n_docs", F.expr("div(total_dl, n_docs)").alias("avgdl")
    )
    qtf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    joined = (
        qtf.join(F.broadcast(dft), on="token")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_ratio",
            F.expr(
                f"div((2 * n_docs + 2) * {1 << IDF_PRESHIFT}L, 2 * df + 1)"
            ),
        )
        .withColumn(
            "idf_1024",
            F.expr(ilog2_1024_spark("idf_ratio"))
            - F.lit(IDF_PRESHIFT * 1024),
        )
        .withColumn(
            "tfn",
            F.expr(
                f"div(88 * tf * avgdl * {BM25_SCALE}L, "
                f"40 * tf * avgdl + 12 * avgdl + 36 * dl)"
            ),
        )
    )
    scores = joined.groupBy(id_col).agg(
        F.sum(F.col("idf_1024") * F.col("tfn")).alias("bm25_fp"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    return scores.orderBy(F.col("bm25_fp").desc(), id_col).limit(k)


def bm25_topk_sql(
    terms: list[str],
    norm_sql: str,
    k: int = 20,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`bm25_topk` (same integer arithmetic,
    same tie-breaks)."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split({norm_sql}, ' ')) AS token
  FROM {table}
),
dl AS (SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avgdl
  FROM dl
),
qtf AS (
  SELECT {id_col}, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token IN ({in_list}) GROUP BY 1, 2
),
dft AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY 1),
parts AS (
  SELECT q.{id_col},
         (2 * s.n_docs + 2) * {1 << IDF_PRESHIFT} // (2 * d.df + 1)
             AS idf_ratio,
         q.tf, l.dl, s.avgdl
  FROM qtf q JOIN dft d USING (token)
  JOIN dl l USING ({id_col}) CROSS JOIN stats s
),
scored AS (
  SELECT {id_col},
         ({ilog2_1024_duck("idf_ratio")} - {IDF_PRESHIFT * 1024})
         * (88 * tf * avgdl * {BM25_SCALE}
            // (40 * tf * avgdl + 12 * avgdl + 36 * dl)) AS term_score
  FROM parts
)
SELECT {id_col},
       CAST(SUM(term_score) AS BIGINT) AS bm25_fp,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
FROM scored GROUP BY {id_col}
ORDER BY bm25_fp DESC, {id_col} LIMIT {k}
"""


def positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted-index postings (r9): one row per token
    OCCURRENCE — ``(token, id, pos)`` with 0-based positions in the
    normalized token stream. The index BM25 (a33) doesn't keep:
    positions, which is what phrase and proximity queries need.

    Map-only (posexplode of the split array, no shuffle); at scale the
    postings table is written bucketed by token so phrase-query joins
    co-locate without an exchange."""
    from xml_to_parquet_spark.functions.text import norm_text

    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.filter(
                    F.split(norm_text(F.col(text_col)), " "),
                    lambda x: x != "",
                )
            ).alias("pos", "token"),
        )
        .select("token", "id", F.col("pos").cast("long").alias("pos"))
    )


def phrase_query(
    postings: DataFrame, phrase: list[str]
) -> DataFrame:
    """Exact phrase matching over a positional index — the classic
    n-way postings intersection: word k of the phrase must appear at
    ``pos + k`` in the same document. Each phrase word contributes one
    token-filtered postings slice (a pushable equality filter — at
    scale each slice is one bucket of the token-bucketed index), and
    the slices chain through (id, offset-aligned pos) equi-joins —
    selectivity collapses after the first join, and AQE broadcasts the
    shrinking side. Returns ``(id, n_matches, first_pos)`` per matching
    document — exact counts, deterministic."""
    if not phrase:
        raise ValueError("phrase must have at least one word")
    phrase = [w.lower() for w in phrase]
    cur = (
        postings.filter(F.col("token") == phrase[0])
        .select("id", F.col("pos").alias("p0"))
    )
    for k, w in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("token") == w).select(
            "id", (F.col("pos") - k).alias("p0")
        )
        cur = cur.join(nxt, ["id", "p0"])
    return (
        cur.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("p0").alias("first_pos"),
        )
        .orderBy("id")
    )


def phrase_query_sql(
    table: str,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle twin of postings build + :func:`phrase_query` over a raw
    document table."""
    words = [w.lower().replace("'", "''") for w in phrase]
    joins = "\n".join(
        f"JOIN p AS p{k} ON p{k}.id = p0.id AND p{k}.token = '{w}' "
        f"AND p{k}.pos = p0.pos + {k}"
        for k, w in enumerate(words[1:], start=1)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         list_filter(string_split(
           lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))), ' '),
         x -> x <> '') AS tk
  FROM {table}
),
p AS (
  SELECT id, i - 1 AS pos, tk[CAST(i AS INTEGER)] AS token
  FROM toks,
       unnest(generate_series(1, CAST(len(tk) AS BIGINT))) AS t(i)
)
SELECT p0.id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(p0.pos) AS BIGINT) AS first_pos
FROM p AS p0
{joins}
WHERE p0.token = '{words[0]}'
GROUP BY p0.id ORDER BY p0.id
"""


def near_query(
    postings: DataFrame, w1: str, w2: str, slop: int = 3
) -> DataFrame:
    """Proximity (NEAR/slop) query over the positional index: documents
    where ``w1`` and ``w2`` occur within ``slop`` positions of each
    other, in either order — Lucene's sloppy phrase, the recall-side
    companion of :func:`phrase_query`'s exact matching.

    Plan shape: |pos1 − pos2| ≤ slop is not an equi-join key, so the
    bounded offset is ENUMERATED — the w1 slice explodes into its
    2·slop+1 acceptable partner positions (sequence(pos−slop,
    pos+slop)) and joins the w2 slice on (id, exact pos) — the
    established bounded-range-join shape: pure equi-join, AQE-sizable,
    never a cross product, cost ∝ occurrences·slop. Self-pairs (same
    position, only possible when w1 == w2) are excluded. Returns
    ``(id, n_pairs, min_gap)`` per matching document."""
    if slop < 1:
        raise ValueError(f"need slop >= 1, got {slop}")
    a = (
        postings.filter(F.col("token") == w1.lower())
        .select(
            "id",
            F.col("pos").alias("pos_a"),
            F.explode(
                F.sequence(
                    F.col("pos") - slop, F.col("pos") + slop
                )
            ).alias("pos_b"),
        )
    )
    b = postings.filter(F.col("token") == w2.lower()).select(
        "id", F.col("pos").alias("pos_b")
    )
    return (
        a.join(b, ["id", "pos_b"])
        .filter(F.col("pos_a") != F.col("pos_b"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.abs(F.col("pos_a") - F.col("pos_b"))).alias("min_gap"),
        )
        .orderBy("id")
    )


def near_query_sql(
    table: str,
    w1: str,
    w2: str,
    slop: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle twin of postings build + :func:`near_query`."""
    w1 = w1.lower().replace("'", "''")
    w2 = w2.lower().replace("'", "''")
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         list_filter(string_split(
           lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))), ' '),
         x -> x <> '') AS tk
  FROM {table}
),
p AS (
  SELECT id, i - 1 AS pos, tk[CAST(i AS INTEGER)] AS token
  FROM toks,
       unnest(generate_series(1, CAST(len(tk) AS BIGINT))) AS t(i)
)
SELECT a.id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(abs(a.pos - b.pos)) AS BIGINT) AS min_gap
FROM p a JOIN p b
  ON a.id = b.id AND b.pos BETWEEN a.pos - {slop} AND a.pos + {slop}
 AND a.pos <> b.pos
WHERE a.token = '{w1}' AND b.token = '{w2}'
GROUP BY a.id ORDER BY a.id
"""


def more_like_this(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    max_df_ppm: int = 500_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse lexical "more-like-this": for each query document, the
    top-``k`` most similar documents by an integer tf·idf dot product
    over shared tokens — the inverted-index complement of the dense
    (embedding) ANN family: no model, exact, and the shuffle rides the
    same token-keyed index BM25 uses.

    Score(q, d) = Σ_t tf_q(t) · tf_d(t) · w(t) with the integer
    inverse-df weight w(t) = n_docs·1e6 // df(t). Tokens appearing in
    more than ``max_df_ppm`` of documents are DROPPED before the join —
    the scale-critical prune: a stopword shared by every document would
    otherwise make candidate volume quadratic in the corpus; after the
    prune it is Σ_t df(t)·|Q∩t| with df bounded. The weight product is
    guarded with try_multiply + raise_error (the PMI overflow
    contract): past n_docs ≈ 3e6 switch to the BM25 ilog2 fixed-point
    weighting instead of silently wrapping.

    Plan: one tf aggregation (token,doc-keyed), one |vocab| df
    aggregation, the query slice broadcast, candidates from a
    token-keyed equi-join, one (query, cand) sum, WindowGroupLimit
    top-k with deterministic ties (score DESC, neighbor ASC). Returns
    ``(query_id, neighbor_id, score, rank)``."""
    from xml_to_parquet_spark.functions.text import norm_text

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(norm_text(F.col(text_col)), " "),
                lambda x: x != "",
            )
        ).alias("token"),
    )
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    dft = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 1_000_000 <= F.col("n_docs") * max_df_ppm)
        .withColumn(
            "w",
            F.expr(
                "div(ifnull(try_multiply(n_docs, 1000000L), "
                "raise_error('more_like_this: n_docs * 1e6 overflows "
                "int64; use the BM25 ilog2 weighting at this scale')), "
                "df)"
            ),
        )
        .select("token", "w")
    )
    qtf = tf.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        "token",
        F.col("tf").alias("tf_q"),
    )
    from pyspark.sql import Window

    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        tf.join(F.broadcast(qtf), "token")
        .filter(F.col("id") != F.col("query_id"))
        .join(dft, "token")
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(F.sum(F.col("tf") * F.col("tf_q") * F.col("w")).alias("score"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def more_like_this_sql(
    table: str = "documents",
    query_max: int = 5,
    k: int = 5,
    max_df_ppm: int = 500_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle twin of :func:`more_like_this` for
    query_ids=range(query_max)."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         unnest(list_filter(string_split(
           lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))), ' '),
         x -> x <> '')) AS token
  FROM {table}
),
tf AS (SELECT id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
nd AS (SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM {table}),
dft AS (
  SELECT token, CAST(n_docs * 1000000 // COUNT(*) AS BIGINT) AS w
  FROM tf, nd GROUP BY token, n_docs
  HAVING COUNT(*) * 1000000 <= n_docs * {max_df_ppm}
),
scored AS (
  SELECT q.id AS query_id, c.id AS neighbor_id,
         SUM(c.tf * q.tf * dft.w) AS score
  FROM tf q
  JOIN tf c ON c.token = q.token AND c.id != q.id
  JOIN dft ON dft.token = q.token
  WHERE q.id < {query_max}
  GROUP BY q.id, c.id
),
ranked AS (
  SELECT query_id, neighbor_id, CAST(score AS BIGINT) AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, rank
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


RRF_SCALE = 1_000_000_000  # integer reciprocal-rank unit (ppb)


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (r10) — the standard hybrid-search merge
    (Cormack/Clarke/Büttcher RRF): each channel contributes
    ``RRF_SCALE div (k_const + rank)`` per document; channels that
    missed a document contribute nothing. All-integer, so the fused
    ranking is bit-exact in any engine — no score normalization problem
    (the reason RRF beats score interpolation across incompatible
    channel scales like BM25 fixed-point vs cosine).

    Inputs: each DataFrame carries (``id_col``, ``rank``) — the top-C of
    one retrieval channel (BM25, ANN, phrase, ...). Output:
    (id, rrf_ppb, n_channels, fused_rank) top-``k`` by
    (rrf_ppb DESC, id ASC).

    Plan shape: channels are already tiny (top-C each), so the union +
    one groupBy + one WindowGroupLimit is model-sized work regardless of
    corpus size — the corpus cost lives in the channels themselves.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k_const < 1:
        raise ValueError(f"rrf_fuse: k_const must be >= 1, got {k_const}")
    from pyspark.sql import Window

    u = rankings[0].select(id_col, "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select(id_col, "rank"))
    contrib = F.expr(f"div({RRF_SCALE}L, {k_const} + rank)")
    fused = u.groupBy(id_col).agg(
        F.sum(contrib).alias("rrf_ppb"),
        F.count(F.lit(1)).cast("int").alias("n_channels"),
    )
    w = Window.orderBy(F.col("rrf_ppb").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .orderBy("fused_rank")
    )
