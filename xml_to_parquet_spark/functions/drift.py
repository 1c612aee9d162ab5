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

#: Buckets both engines can align identically via epoch-second integer
#: division (no calendar units — months/quarters have no fixed width).
BUCKET_SECONDS = {
    "1 hour": 3_600,
    "1 day": 86_400,
    "1 week": 604_800,
}


def bucket_seconds(bucket: str) -> int:
    """Width of ``bucket`` in seconds, or ValueError naming the allowed
    values. Shared by the Spark plan and the SQL oracle so a single
    alignment rule (FLOOR epoch-second division, 1970-01-01 origin)
    governs both — F.window and DuckDB time_bucket disagree on week
    origins (Thursday epoch vs 2000-01-03 Monday), so neither is used."""
    try:
        return BUCKET_SECONDS[bucket]
    except KeyError:
        raise ValueError(
            f"unsupported bucket {bucket!r}; supported: "
            f"{sorted(BUCKET_SECONDS)}"
        ) from None


def epoch_bucket_sql(ts_col: str, secs: int) -> str:
    """FLOOR-division epoch bucket as a Spark SQL fragment.

    Spark's ``div`` truncates toward zero while the DuckDB oracles use
    ``//`` (floors) — they disagree exactly on negative epoch seconds
    (pre-1970 timestamps), which would silently misalign buckets. Since
    ``secs > 0``, floor(a/secs) = div(a,secs) - 1 when the truncating
    remainder is negative, which is exact in int64 (no float round
    trip). Shared by bucket_anomalies and cohort_retention so one
    alignment rule governs every bucketing operator and its oracle."""
    a = f"unix_timestamp({ts_col})"
    return (
        f"(div({a}, {secs}L) + (CASE WHEN {a} % {secs}L < 0 "
        f"THEN -1L ELSE 0L END))"
    )


def floor_div_duck(a: str, b: int) -> str:
    """Oracle twin of the floor rule: FLOOR integer division as a
    DuckDB SQL fragment. DuckDB's ``//`` TRUNCATES on integers
    (``-5400 // 3600 = -1``, measured) and is plain ``/`` on doubles,
    so a bare ``//`` would keep the double-width bucket straddling the
    epoch. Sign-aware for positive divisors (DuckDB ``%`` follows the
    dividend sign, same as Spark)."""
    return (
        f"(({a}) // {b} + (CASE WHEN ({a}) % {b} < 0 THEN -1 ELSE 0 END))"
    )


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
    return drift_report_from_counts(counts, top_k)


def drift_report_from_counts(counts: DataFrame, top_k: int = 20) -> DataFrame:
    """The report half of :func:`frequency_drift`, factored so MERGED
    partial counts feed the same arithmetic — per-key (cnt_a, cnt_b)
    sums are associative, so micro-batch partials published by the
    streaming monitor (streaming.file_stream.stream_docs_drift) fold
    into the bit-identical report the one-pass batch monitor produces.
    Input: ``(key, cnt_a, cnt_b)``."""
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


def bucket_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    bucket: str = "1 hour",
    k_num: int = 2,
    k_den: int = 1,
    top_k: int = 20,
) -> DataFrame:
    """Volume-anomaly detection over time-bucketed event counts — the
    monitoring twin of :func:`frequency_drift`: which hours of which
    event stream spiked (or cratered) beyond ``k = k_num/k_den``
    standard deviations of that stream's own bucket distribution?

    The z-score test is rendered in exact integers. With per-group
    bucket counts ``c_1..c_n``, ``tot = Σc`` and ``sumsq = Σc²``:

        |c - μ| > k·σ  ⇔  k_den²·(n·c - tot)² > k_num²·(n·sumsq - tot²)

    (both sides int64 — multiply out the two divisions-by-n hiding in μ
    and σ²; no floats, no sqrt). The report carries the ratio of the two
    sides in ppm (``z²`` in ppm of ``k²``), so reviewers see magnitude
    and the flag is just ``z2_ppm > 1e6``. Overflow contract:
    ``(n·max_cnt)² · 1e6`` must fit int64 ⇒ ``n_buckets · max_bucket_cnt
    ≲ 3e6`` — at larger scales coarsen the bucket or pre-div the counts
    (same contract style as pagerank's ``scale·weight`` bound).

    Shape: ONE map-side-combined groupBy builds the bucket table
    (shuffle ∝ groups × buckets, corpus-independent); per-group moments
    are a second groupBy OF THAT TABLE (≪ data); the join back is
    group-keyed and broadcast-sized. Constant series (σ = 0) flag any
    deviation; the ppm denominator is clamped to ≥1.

    Returns ``(grp, bucket_start, cnt, z2_ppm, is_anomaly)`` — top
    ``top_k`` by z2_ppm desc, then grp/bucket asc (deterministic)."""
    secs = bucket_seconds(bucket)
    buckets = (
        df.groupBy(
            F.col(group_col).alias("grp"),
            F.expr(
                f"{epoch_bucket_sql(ts_col, secs)} * {secs}L"
            ).alias("bsec"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "grp",
            F.from_unixtime("bsec", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "cnt",
        )
    )
    stats = buckets.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("tot"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
    )
    scored = (
        buckets.join(F.broadcast(stats), "grp")
        .withColumn("dev", F.col("n") * F.col("cnt") - F.col("tot"))
        .withColumn(
            "thr",
            F.lit(k_num * k_num)
            * (F.col("n") * F.col("sumsq") - F.col("tot") * F.col("tot")),
        )
        .withColumn(
            "z2_ppm",
            F.expr(
                f"div({k_den * k_den}L * dev * dev * {PPM}L, "
                "greatest(thr, 1L))"
            ),
        )
        .withColumn(
            "is_anomaly", (F.col("z2_ppm") > PPM).cast("int")
        )
    )
    return (
        scored.orderBy(
            F.col("z2_ppm").desc(), F.col("grp").asc(),
            F.col("bucket_start").asc(),
        )
        .limit(top_k)
        .select("grp", "bucket_start", "cnt", "z2_ppm", "is_anomaly")
    )


def bucket_anomalies_sql(
    table: str = "events",
    ts_col: str = "ts",
    group_col: str = "event_type",
    bucket_interval: str = "1 hour",
    k_num: int = 2,
    k_den: int = 1,
    top_k: int = 20,
) -> str:
    """Oracle twin of :func:`bucket_anomalies` — same bucket table, same
    integer moment algebra, same ordering. Buckets via the same
    epoch-second FLOOR division as the Spark plan (epoch_bucket_sql;
    DuckDB ``//`` floors natively, make_timestamp keeps it
    tz-independent), so hour/day/week align identically even for
    pre-1970 (negative-epoch) timestamps."""
    secs = bucket_seconds(bucket_interval)
    epoch_s = floor_div_duck(f"epoch_ms(CAST({ts_col} AS TIMESTAMP))", 1000)
    bucket_b = floor_div_duck(epoch_s, secs)
    return f"""
WITH buckets AS (
  SELECT {group_col} AS grp,
         strftime(make_timestamp(
             {bucket_b} * {secs}::BIGINT * 1000000),
                  '%Y-%m-%d %H:%M:%S') AS bucket_start,
         COUNT(*) AS cnt
  FROM {table} GROUP BY 1, 2
),
stats AS (
  SELECT grp, COUNT(*) AS n, SUM(cnt) AS tot, SUM(cnt * cnt) AS sumsq
  FROM buckets GROUP BY grp
),
scored AS (
  SELECT b.grp, b.bucket_start, b.cnt,
         {k_den * k_den} * (n * cnt - tot) * (n * cnt - tot) * {PPM}
           // greatest({k_num * k_num} * (n * sumsq - tot * tot), 1)
           AS z2_ppm
  FROM buckets b JOIN stats USING (grp)
)
SELECT grp, bucket_start, CAST(cnt AS BIGINT) AS cnt,
       CAST(z2_ppm AS BIGINT) AS z2_ppm,
       CAST(z2_ppm > {PPM} AS INTEGER) AS is_anomaly
FROM scored
ORDER BY z2_ppm DESC, grp ASC, bucket_start ASC LIMIT {top_k}
"""


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "source",
    n: int = 2,
) -> DataFrame:
    """Per-slice corpus diversity: the word-``n``-gram type/token ratio
    (distinct grams ÷ gram instances, integer ppm) — the
    templated-content / mode-collapse monitor next to
    :func:`frequency_drift` (a slice whose TTR craters is boilerplate or
    synthetic loops; the corpus-level cousin of per-doc
    ``repetition_features``).

    Grams are built ROW-LOCALLY by an array transform over the token
    array (no shuffle, no join, work ∝ doc length); the only shuffles
    are the two map-side-combinable aggregations behind
    ``count`` + ``count(distinct)`` per slice (shuffle ∝ slice
    vocabulary, not corpus). Docs with fewer than ``n`` tokens
    contribute nothing (no evidence). Output: ``(label, n_grams,
    n_distinct, ttr_ppm)`` ordered by label."""
    from xml_to_parquet_spark.functions.text import norm_text

    toks = df.select(
        F.col(label_col).alias("label"),
        F.split(norm_text(F.col(text_col)), " ").alias("toks"),
    )
    grams = toks.select(
        "label",
        F.explode(
            F.when(
                F.size("toks") >= n,
                F.expr(
                    "transform(sequence(0, size(toks) - %d), "
                    "i -> array_join(slice(toks, i + 1, %d), ' '))" % (n, n)
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    return (
        grams.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_distinct(F.col("gram")).alias("n_distinct"),
        )
        .withColumn(
            "ttr_ppm", F.expr("div(n_distinct * 1000000L, n_grams)")
        )
        .orderBy("label")
    )


def ngram_diversity_sql(
    table: str = "documents",
    norm_sql: str = "text",
    label_col: str = "source",
    n: int = 2,
) -> str:
    """Oracle twin of :func:`ngram_diversity` — same row-local gram
    construction (DuckDB list_transform 1-based ↔ Spark slice), same
    counts, same truncating ppm."""
    return f"""
WITH toks AS (
  SELECT {label_col} AS label, string_split({norm_sql}, ' ') AS t
  FROM {table}
),
grams AS (
  SELECT label, unnest(
    CASE WHEN len(t) >= {n}
         THEN list_transform(range(1, len(t) - {n} + 2),
                             i -> array_to_string(list_slice(t, i, i + {n} - 1), ' '))
         ELSE [] END) AS gram
  FROM toks
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
       CAST(COUNT(DISTINCT gram) * 1000000 // COUNT(*) AS BIGINT) AS ttr_ppm
FROM grams GROUP BY label ORDER BY label
"""
