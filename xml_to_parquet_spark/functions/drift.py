"""Distribution-drift monitoring between two corpus slices.

The training-data QA question every refresh cycle asks: did this crawl's
token/domain/language distribution move against the last one — before the
model finds out? The detector compares per-key relative frequencies of
two labeled slices (old vs new crawl, source A vs B) in integer ppm, so
both engines replay every number bit-for-bit (no floats, no logs).

Scale shape: ONE map-side-combined groupBy over the keyed stream (the
conditional-sum trick folds both slices in the same pass — no join of
two aggregates), the two totals as a 1-row agg broadcast into the plan,
and a rank-k cut for the report. Shuffle ∝ distinct keys, not corpus.
The statistic is the per-key |Δppm| (the summand of total variation
distance × 2e6); the report returns the top-k movers plus each side's
ppm so a reviewer sees direction and magnitude.

No reference parity (the R engine has no corpus-QA surface); this is
part of the mandated training-data-pipeline extensions (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def frequency_drift(
    df: DataFrame,
    label_col: str,
    label_a: str,
    label_b: str,
    key_col: str = "token",
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` keys whose relative frequency moved most between
    slice ``label_a`` and slice ``label_b``.

    Output: ``(key, cnt_a, cnt_b, ppm_a, ppm_b, dppm)`` ordered by
    ``dppm`` desc then key asc (deterministic). ``ppm_x = cnt_x * 1e6
    // tot_x`` with truncating integer division; a key absent from one
    slice gets ppm 0 there — appearing/vanishing vocabulary is drift
    too. Raises nothing on empty slices: totals are clamped to ≥1 so
    the report degrades to zeros instead of dividing by zero."""
    keyed = df.filter(
        F.col(label_col).isin([label_a, label_b])
    ).select(
        F.col(key_col).alias("key"),
        (F.col(label_col) == label_a).cast("long").alias("is_a"),
        (F.col(label_col) == label_b).cast("long").alias("is_b"),
    )
    counts = keyed.groupBy("key").agg(
        F.sum("is_a").alias("cnt_a"), F.sum("is_b").alias("cnt_b")
    )
    totals = counts.agg(
        F.greatest(F.sum("cnt_a"), F.lit(1)).alias("tot_a"),
        F.greatest(F.sum("cnt_b"), F.lit(1)).alias("tot_b"),
    )
    ppm = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("ppm_a", F.expr(f"div(cnt_a * {PPM}L, tot_a)"))
        .withColumn("ppm_b", F.expr(f"div(cnt_b * {PPM}L, tot_b)"))
        .withColumn("dppm", F.abs(F.col("ppm_a") - F.col("ppm_b")))
    )
    return (
        ppm.orderBy(F.col("dppm").desc(), F.col("key").asc())
        .limit(top_k)
        .select("key", "cnt_a", "cnt_b", "ppm_a", "ppm_b", "dppm")
    )


def frequency_drift_sql(
    table: str,
    label_expr: str,
    label_a: str,
    label_b: str,
    key_expr: str,
    top_k: int = 20,
    with_ctes: str = "",
) -> str:
    """Oracle twin of :func:`frequency_drift` (same conditional-sum
    fold, same truncating ppm arithmetic, same deterministic order)."""
    pre = f"{with_ctes}," if with_ctes else ""
    return f"""
WITH {pre} keyed AS (
  SELECT {key_expr} AS key,
         CAST({label_expr} = '{label_a}' AS BIGINT) AS is_a,
         CAST({label_expr} = '{label_b}' AS BIGINT) AS is_b
  FROM {table}
  WHERE {label_expr} IN ('{label_a}', '{label_b}')
),
counts AS (
  SELECT key, SUM(is_a) AS cnt_a, SUM(is_b) AS cnt_b
  FROM keyed GROUP BY key
),
totals AS (
  SELECT greatest(SUM(cnt_a), 1) AS tot_a,
         greatest(SUM(cnt_b), 1) AS tot_b
  FROM counts
),
ppm AS (
  SELECT key, cnt_a, cnt_b,
         cnt_a * {PPM} // tot_a AS ppm_a,
         cnt_b * {PPM} // tot_b AS ppm_b,
         abs(cnt_a * {PPM} // tot_a - cnt_b * {PPM} // tot_b) AS dppm
  FROM counts, totals
)
SELECT key, CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
       CAST(ppm_a AS BIGINT) AS ppm_a, CAST(ppm_b AS BIGINT) AS ppm_b,
       CAST(dppm AS BIGINT) AS dppm
FROM ppm ORDER BY dppm DESC, key ASC LIMIT {top_k}
"""
