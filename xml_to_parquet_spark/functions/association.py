"""Token co-occurrence association mining (PMI / lift).

The corpus-analysis question behind phrase mining, collocation
extraction, and tokenizer-merge candidates: which token PAIRS appear in
the same document far more often than independence predicts? The
statistic is pointwise mutual information; this module reports its exact
integer surrogate ``lift_ppm = (c_xy * n_docs * 1e6) div (c_x * c_y)``
(PMI = log(lift), and log is monotone, so ranking by lift_ppm IS ranking
by PMI — without floats, so any engine replays the scores bit-for-bit).

Scale shape: one corpus scan builds the distinct (doc, token) presence
table; document frequencies come from ONE map-side-combined groupBy of
that table (shuffle ∝ vocabulary, materialized once — it feeds three
consumers); the min_df survivors fold into one sorted per-doc token
array, and the pair generator is a double explode of that array — pure
codegen generators, no self-join, no window. The classic co-occurrence
explosion is bounded two ways BEFORE the generator runs (the a-priori
trick):

- ``min_df`` drops hapax/rare tokens (a pair's df can't exceed either
  member's, so pruning members prunes pairs losslessly for any pair
  that could pass a min-support cut);
- ``cap_per_doc`` keeps a deterministic per-doc token cap (slice of the
  lexicographically sorted array) so one pathological mega-doc cannot
  emit O(L²) pairs. The pre-slice collected array holds one doc's
  distinct tokens — no bigger than the doc text that already transits a
  single row — so the collect_list is not an unbounded-group risk; the
  cap bounds what the generator AMPLIFIES.

Pair counting is a map-side-combined groupBy on (t1, t2); n_docs rides a
broadcast 1-row agg. Overflow contract: ``c_xy * n_docs * 1e6`` must fit
int64 — holds through ~3e6 exhaustive docs; larger corpora pass a
pre-scaled ``n_docs`` (both engines see the same value, exactness is
about determinism, not magnitude).

No reference parity (the R engine has no corpus-analysis surface); part
of the mandated training-data-pipeline extensions (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    min_pair_count: int = 2,
    cap_per_doc: int = 1000,
    top_k: int = 30,
) -> DataFrame:
    """Top-``top_k`` within-document token pairs by exact integer lift.

    Output ``(t1, t2, c_xy, c_x, c_y, lift_ppm)`` ordered by
    ``lift_ppm`` desc, then ``(t1, t2)`` asc — fully deterministic.
    Presence-based counting: a token appearing 5× in one doc counts
    once (collocation df, not term frequency)."""
    from xml_to_parquet_spark.functions.text import norm_text

    # The raw corpus is exploded exactly ONCE: per-doc dedup happens
    # inside the same aggregation (map-side-combining collect_set), and
    # the compact per-doc arrays are materialized (lazy localCheckpoint)
    # so every downstream consumer — df table, min_df prune, pair
    # generator — re-derives from arrays instead of re-scanning the
    # corpus. (The first formulation self-joined the presence pipeline
    # and recomputed it per branch plus a per-doc row_number window:
    # measured 5.97 s at sf0.1; the array form measures 1.9 s.)
    presence_arrays = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("doc")
        .agg(F.sort_array(F.collect_set("tok")).alias("toks"))
        .localCheckpoint(eager=False)
    )
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # dfreq feeds three consumers (min_df filter, c_x, c_y); vocab-sized,
    # materialized once — same hygiene as pagerank's edge table
    dfreq = (
        presence_arrays.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # min_df pruning is a vocab-keyed equi-join (AQE-broadcastable); the
    # survivors fold back into ONE sorted per-doc array and pairs come
    # from a double explode of that array — pure codegen generators, no
    # self-join, no window. slice() applies the deterministic
    # lexicographic cap.
    kept = presence_arrays.select(
        "doc", F.explode("toks").alias("tok")
    ).join(dfreq.filter(F.col("c") >= min_df).select("tok"), "tok")
    doc_toks = (
        kept.groupBy("doc")
        .agg(F.slice(F.sort_array(F.collect_list("tok")), 1, cap_per_doc)
             .alias("toks"))
    )
    pairs = (
        doc_toks.select("doc", F.explode("toks").alias("t1"), "toks")
        .select("doc", "t1", F.explode("toks").alias("t2"))
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_pair_count)
    )
    cx = dfreq.select(F.col("tok").alias("t1"), F.col("c").alias("c_x"))
    cy = dfreq.select(F.col("tok").alias("t2"), F.col("c").alias("c_y"))
    return (
        pairs.join(cx, "t1")
        .join(cy, "t2")
        .crossJoin(F.broadcast(n_docs))
        # Overflow contract ENFORCED, not just documented: the lift
        # numerator must fit int64 (c_xy ≤ n_docs ⇒ bound is roughly
        # n_docs ≲ 3e6 presence rows per token pair). try_multiply
        # nulls on overflow and raise_error turns that null into a loud
        # failure instead of a silently wrapped lift_ppm.
        .withColumn(
            "lift_ppm",
            F.expr(
                f"div(ifnull(try_multiply(try_multiply(c_xy, n_docs), "
                f"{PPM}L), raise_error('pmi_pairs: c_xy * n_docs * 1e6 "
                f"overflows int64 (n_docs beyond ~3e6); shard the corpus "
                f"or pre-aggregate before pmi_pairs')), c_x * c_y)"
            ),
        )
        .orderBy(F.col("lift_ppm").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(top_k)
        .select("t1", "t2", "c_xy", "c_x", "c_y", "lift_ppm")
    )


def pmi_pairs_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    norm_sql: str | None = None,
    min_df: int = 2,
    min_pair_count: int = 2,
    cap_per_doc: int = 1000,
    top_k: int = 30,
) -> str:
    """DuckDB oracle twin of :func:`pmi_pairs` — same presence/df/cap/
    pair chain, same truncating lift arithmetic, same order."""
    norm = norm_sql or f"lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g')))"
    return f"""
WITH presence AS (
  SELECT DISTINCT {id_col} AS doc, tok
  FROM (SELECT {id_col}, unnest(string_split({norm}, ' ')) AS tok
        FROM {table})
  WHERE tok <> ''
),
nd AS (SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM {table}),
dfreq AS (SELECT tok, COUNT(*) AS c FROM presence GROUP BY tok),
kept AS (
  SELECT doc, tok, c,
         row_number() OVER (PARTITION BY doc ORDER BY tok) AS rn
  FROM presence JOIN dfreq USING (tok)
  WHERE c >= {min_df}
),
capped AS (SELECT doc, tok, c FROM kept WHERE rn <= {cap_per_doc}),
pairs AS (
  SELECT a.tok AS t1, b.tok AS t2, a.c AS c_x, b.c AS c_y,
         COUNT(*) AS c_xy
  FROM capped a JOIN capped b ON a.doc = b.doc AND a.tok < b.tok
  GROUP BY a.tok, b.tok, a.c, b.c
  HAVING COUNT(*) >= {min_pair_count}
)
SELECT t1, t2, CAST(c_xy AS BIGINT) AS c_xy, CAST(c_x AS BIGINT) AS c_x,
       CAST(c_y AS BIGINT) AS c_y,
       CAST(c_xy * n_docs * {PPM} // (c_x * c_y) AS BIGINT) AS lift_ppm
FROM pairs, nd
ORDER BY lift_ppm DESC, t1 ASC, t2 ASC LIMIT {top_k}
"""


def skipgram_cooccurrence(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    min_count: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Skip-gram window co-occurrence counts (r9) — the word2vec/GloVe
    training primitive: for every token position, count the unordered
    pair it forms with each token at most ``window`` positions to its
    right (canonical (least, greatest) keys; repeated-token self-pairs
    are real co-occurrences and counted). Complements
    :func:`pmi_pairs`, which counts document-level PRESENCE pairs —
    this is positional TOKEN-frequency co-occurrence, the matrix
    embedding trainers factorize.

    Plan shape: pair generation is ENTIRELY row-local — the token array
    is zipped with itself shifted by each offset 1..window
    (zip_with(slice, slice)), flattened, exploded; no self-join, no
    per-doc window function. Pair volume is corpus_tokens × window
    (LINEAR, never quadratic in document length), and the single
    shuffle is the map-side-combined (t1, t2) count — ∝ distinct
    pairs, Zipf-bounded in natural corpora and cut by ``min_count``
    before the deterministic top-k sort (n desc, t1, t2).
    """
    from xml_to_parquet_spark.functions.text import norm_text

    if window < 1:
        raise ValueError(f"need window >= 1, got {window}")
    toks = F.filter(
        F.split(norm_text(F.col(text_col)), " "), lambda x: x != ""
    )
    pair_expr = (
        f"flatten(transform(sequence(1, {window}), d -> "
        f"zip_with(slice(tk, 1, greatest(size(tk) - d, 0)), "
        f"slice(tk, d + 1, greatest(size(tk) - d, 0)), "
        f"(a, b) -> named_struct('t1', least(a, b), "
        f"'t2', greatest(a, b)))))"
    )
    return (
        df.select(F.col(id_col), toks.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(top_k)
    )


def skipgram_cooccurrence_sql(
    table: str = "documents",
    text_col: str = "text",
    window: int = 3,
    min_count: int = 2,
    top_k: int = 50,
) -> str:
    """Oracle twin of :func:`skipgram_cooccurrence` — same
    normalization, same shifted-pair generation via lateral
    generate_series, same canonical keys and deterministic top-k."""
    return f"""
WITH toks AS (
  SELECT list_filter(string_split(
           lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))), ' '),
         x -> x <> '') AS tk
  FROM {table}
),
pairs AS (
  SELECT least(tk[CAST(i AS INTEGER)], tk[CAST(i + d AS INTEGER)]) AS t1,
         greatest(tk[CAST(i AS INTEGER)],
                  tk[CAST(i + d AS INTEGER)]) AS t2
  FROM toks,
       unnest(generate_series(1, {window})) AS u1(d),
       unnest(generate_series(1,
              CAST(greatest(len(tk) - d, 0) AS BIGINT))) AS u2(i)
)
SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY t1, t2
HAVING COUNT(*) >= {min_count}
ORDER BY n DESC, t1 ASC, t2 ASC LIMIT {top_k}
"""
