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
that table (shuffle ∝ vocabulary); the pair generator is a within-doc
self-join of the presence table against itself on the doc key with
``t1 < t2`` — the classic co-occurrence explosion, bounded two ways
BEFORE the join (the a-priori trick):

- ``min_df`` drops hapax/rare tokens (a pair's df can't exceed either
  member's, so pruning members prunes pairs losslessly for any pair
  that could pass a min-support cut);
- ``cap_per_doc`` keeps a deterministic per-doc token cap (lexicographic
  row_number) so one pathological mega-doc cannot emit O(L²) pairs.

Pair counting is a map-side-combined groupBy on (t1, t2); n_docs rides a
broadcast 1-row agg. Overflow contract: ``c_xy * n_docs * 1e6`` must fit
int64 — holds through ~3e6 exhaustive docs; larger corpora pass a
pre-scaled ``n_docs`` (both engines see the same value, exactness is
about determinism, not magnitude).

No reference parity (the R engine has no corpus-analysis surface); part
of the mandated training-data-pipeline extensions (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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

    presence = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    dfreq = presence.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    kept = presence.join(
        dfreq.filter(F.col("c") >= min_df), "tok"
    ).withColumn(
        "rn", F.row_number().over(Window.partitionBy("doc").orderBy("tok"))
    ).filter(F.col("rn") <= cap_per_doc)
    left = kept.select("doc", F.col("tok").alias("t1"), F.col("c").alias("c_x"))
    right = kept.select("doc", F.col("tok").alias("t2"), F.col("c").alias("c_y"))
    pairs = (
        left.join(right, "doc")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2", "c_x", "c_y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_pair_count)
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "lift_ppm", F.expr(f"div(c_xy * n_docs * {PPM}L, c_x * c_y)")
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
