"""Scale-out execution patterns: bucketing, salting, incremental dims.

These are the knobs SURVEY §4/§2.11 says a 100 TB deployment needs beyond
the default plans:

- bucketed tables: co-located joins with NO shuffle on either side
  (the physical replacement for the reference's per-batch locality)
- salted aggregation: two-stage groupBy that spreads a skewed key across
  ``n_salts`` partial groups before the final combine — identical results,
  bounded per-task state (AQE's skew-join handles join skew; this handles
  aggregation skew, which AQE does not repartition)
- incremental dimension merge: assign surrogate keys to NEW values only,
  preserving existing keys — the multi-load star-maintenance the reference
  intends (README.md:184-196) but cannot do with per-batch keys
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table.

    Two tables bucketed the same way join WITHOUT any Exchange — at 100 TB
    this converts every recurring fact⋈fact / fact⋈bridge join from a full
    shuffle into a local zip of co-located buckets.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def salted_grouped_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe grouped sum: partial-aggregate on (keys, salt), then
    combine per key. Bit-identical to the direct groupBy because the sums
    are exact decimals (order-independent) — see operators/aggregation.py.

    Use when one group key holds a disproportionate share of rows (heavy
    hitters): the first stage spreads that key over ``n_salts`` reducers.
    """
    from xml_to_parquet_spark.operators.aggregation import _DEC, _DEC_SUM

    salt = (F.spark_partition_id() % n_salts).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(
            *[
                F.sum(F.col(c).cast(_DEC)).alias(f"__p_{c}")
                for c in sum_cols
            ],
            F.count(F.lit(1)).alias("__p_n"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        *[
            F.sum(F.col(f"__p_{c}")).cast(_DEC_SUM).cast("double").alias(f"{c}_sum")
            for c in sum_cols
        ],
        F.sum("__p_n").alias("n"),
    )


def merge_dimension(
    existing_dim: DataFrame,
    new_values: DataFrame,
    value_col: str,
    key_col: str | None = None,
) -> DataFrame:
    """Incremental dimension maintenance: keep every existing (key, value)
    pair; assign NEW values dense keys continuing after the current max.

    This is the reference's intended cross-load semantics (one global key
    per value, stable across loads — README.md:184-196) made real. The new
    slice is tiny by the dimension cardinality cap, so the anti-join is
    broadcast and the row_number window sorts only the new values.
    """
    key_col = key_col or f"{value_col}_key"
    incoming = (
        new_values.select(value_col)
        .filter(F.col(value_col).isNotNull())
        .distinct()
    )
    novel = incoming.join(
        F.broadcast(existing_dim.select(value_col)), on=value_col, how="left_anti"
    )
    base_max = existing_dim.agg(
        F.coalesce(F.max(key_col), F.lit(0)).alias("m")
    ).collect()[0]["m"]
    w = Window.orderBy(F.col(value_col).asc())
    keyed_new = novel.select(
        (F.row_number().over(w) + F.lit(base_max)).cast("int").alias(key_col),
        F.col(value_col),
    )
    return existing_dim.select(key_col, value_col).unionByName(keyed_new)


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    non-negative integer columns — pure integer expression, exact in any
    engine.

    Why at 100 TB: parquet readers skip files/row-groups via min/max
    statistics, but sorting by ONE column leaves the other's per-file
    ranges as wide as the table. Range-partitioning + sorting by the
    Z-key clusters BOTH dimensions simultaneously, so predicates on
    either column (or both) prune files. This is the layout trick behind
    Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain column.
    """
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z + abit * F.lit(1 << (2 * i)) + bbit * F.lit(1 << (2 * i + 1))
    return z


def zorder_key_sql(a_sql: str, b_sql: str, bits: int = 16) -> str:
    """ANSI twin of :func:`zorder_key` (// and % instead of shifts)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_sql}) // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({b_sql}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write parquet clustered by the Z-order of (col_a, col_b):
    repartitionByRange on the Z-key places similar keys in the same file,
    sortWithinPartitions tightens row-group stats — downstream scans with
    predicates on either column prune most files via min/max statistics.
    One range exchange + per-task sort; no global bottleneck.

    Both columns are min/max-normalized to ``bits`` bits BEFORE
    interleaving — raw interleave lets the wider-ranged column dominate
    the key order and the narrow column gets no clustering at all (this is
    why production ZORDER implementations rank/quantile-map columns
    first). The min/max probe is one tiny agg job.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    top = (1 << bits) - 1

    def norm(col: str, lo, hi) -> Column:
        span = max(int(hi) - int(lo), 1)
        return F.expr(
            f"(CAST({col} AS BIGINT) - {int(lo)}) * {top} div {span}"
        )

    z = zorder_key(norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("__zkey", z)
        .repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zonemap_skip_report(
    df: DataFrame,
    col_a: str,
    col_b: str,
    a_frac: tuple[int, int, int, int] = (3, 8, 5, 8),
    b_frac: tuple[int, int, int, int] = (3, 8, 5, 8),
    log2_files: int = 5,
    bits: int = 8,
) -> DataFrame:
    """What does a layout buy a 2-D box predicate? — the zone-map
    skip-rate evaluator for :func:`write_zordered`.

    Parquet readers skip files/row-groups whose min/max statistics
    cannot overlap a predicate. This operator simulates that skipping
    for THREE layouts of the same table — equi-width bucketing by
    ``col_a``, by ``col_b``, and by their Morton Z-key
    (:func:`zorder_key`, same normalization as write_zordered) — and
    reports, per layout, how many of the 2^``log2_files`` files and
    rows a box predicate must scan. The box is SF-adaptive: each bound
    is a rational fraction of the observed [min, max] span
    (``a_frac = (lo_num, lo_den, hi_num, hi_den)``), computed in-plan
    from the same stats row as the normalization — no driver collect.

    Row-skipping is LOSSLESS by construction: a matching row's own file
    zone map contains its values, so that file always overlaps the box
    — ``rows_matching`` is therefore layout-invariant and every
    matching row lives in a scanned file.

    Scale shape: one tiny stats agg broadcast to every row, then one
    bucket-keyed groupBy per layout (zone maps are metadata-sized:
    2^log2_files rows). In production the zone maps come from parquet
    footers for free; this operator is the layout DECISION tool — run
    it on a sample before paying for the rewrite. NULLs in either
    column are excluded (a zone map says nothing about them; route
    null keys to a dedicated file in production).

    All arithmetic is non-negative integer (casts, ``div``, Morton
    interleave), so the DuckDB twin (:func:`zonemap_skip_report_sql`)
    replays the report exactly.

    Returns one row per layout: ``(layout, n_files, files_scanned,
    rows_total, rows_scanned, rows_matching, file_skip_ppm,
    row_skip_ppm)`` ordered by layout name.
    """
    k = log2_files
    if not (0 < k <= bits):
        raise ValueError(f"need 0 < log2_files <= bits, got {k}/{bits}")
    top = (1 << bits) - 1

    nn = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    stats = nn.agg(
        F.min(F.col(col_a).cast("long")).alias("lo_a"),
        F.max(F.col(col_a).cast("long")).alias("hi_a"),
        F.min(F.col(col_b).cast("long")).alias("lo_b"),
        F.max(F.col(col_b).cast("long")).alias("hi_b"),
    )

    def frac_bound(col: str, num: int, den: int) -> str:
        return f"lo_{col} + (hi_{col} - lo_{col}) * {num} div {den}"

    box = stats.select(
        F.expr(frac_bound("a", a_frac[0], a_frac[1])).alias("abox_lo"),
        F.expr(frac_bound("a", a_frac[2], a_frac[3])).alias("abox_hi"),
        F.expr(frac_bound("b", b_frac[0], b_frac[1])).alias("bbox_lo"),
        F.expr(frac_bound("b", b_frac[2], b_frac[3])).alias("bbox_hi"),
        F.col("lo_a"),
        F.col("hi_a"),
        F.col("lo_b"),
        F.col("hi_b"),
    )

    norm_a = (
        f"(CAST({col_a} AS BIGINT) - lo_a) * {top} "
        "div greatest(hi_a - lo_a, 1)"
    )
    norm_b = (
        f"(CAST({col_b} AS BIGINT) - lo_b) * {top} "
        "div greatest(hi_b - lo_b, 1)"
    )
    base = nn.crossJoin(F.broadcast(box)).select(
        F.col(col_a).cast("long").alias("a"),
        F.col(col_b).cast("long").alias("b"),
        F.expr(norm_a).alias("na"),
        F.expr(norm_b).alias("nb"),
        F.expr(
            f"CASE WHEN CAST({col_a} AS BIGINT) BETWEEN abox_lo AND abox_hi"
            f" AND CAST({col_b} AS BIGINT) BETWEEN bbox_lo AND bbox_hi"
            " THEN 1 ELSE 0 END"
        ).alias("m"),
    )

    zbase = base.withColumn(
        "z", zorder_key(F.col("na"), F.col("nb"), bits)
    )
    layouts = [
        ("bycol_a", base, f"na div {1 << (bits - k)}"),
        ("bycol_b", base, f"nb div {1 << (bits - k)}"),
        ("zorder", zbase, f"z div {1 << (2 * bits - k)}"),
    ]
    reports = []
    for name, src, bucket_sql in layouts:
        files = (
            src.withColumn("f", F.expr(bucket_sql))
            .groupBy("f")
            .agg(
                F.min("a").alias("mna"),
                F.max("a").alias("mxa"),
                F.min("b").alias("mnb"),
                F.max("b").alias("mxb"),
                F.count(F.lit(1)).alias("nr"),
                F.sum("m").alias("nm"),
            )
            .crossJoin(F.broadcast(box.select(
                "abox_lo", "abox_hi", "bbox_lo", "bbox_hi"
            )))
        )
        scanned = (
            (F.col("mna") <= F.col("abox_hi"))
            & (F.col("mxa") >= F.col("abox_lo"))
            & (F.col("mnb") <= F.col("bbox_hi"))
            & (F.col("mxb") >= F.col("bbox_lo"))
        )
        reports.append(
            files.agg(
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(scanned.cast("long")).alias("files_scanned"),
                F.sum("nr").cast("long").alias("rows_total"),
                F.sum(F.when(scanned, F.col("nr")).otherwise(0))
                .cast("long")
                .alias("rows_scanned"),
                F.sum("nm").cast("long").alias("rows_matching"),
            ).select(
                F.lit(name).alias("layout"),
                "n_files",
                "files_scanned",
                "rows_total",
                "rows_scanned",
                "rows_matching",
                F.expr(
                    "CASE WHEN n_files > 0 THEN (1000000 * "
                    "(n_files - files_scanned)) div n_files END"
                ).alias("file_skip_ppm"),
                F.expr(
                    "CASE WHEN rows_total > 0 THEN (1000000 * "
                    "(rows_total - rows_scanned)) div rows_total END"
                ).alias("row_skip_ppm"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("layout")


def zonemap_skip_report_sql(
    table: str,
    col_a: str,
    col_b: str,
    a_frac: tuple[int, int, int, int] = (3, 8, 5, 8),
    b_frac: tuple[int, int, int, int] = (3, 8, 5, 8),
    log2_files: int = 5,
    bits: int = 8,
) -> str:
    """ANSI twin of :func:`zonemap_skip_report` — same stats row, same
    rational box bounds, same Morton interleave (// and %), same ppm
    floor-division (all operands non-negative, so // == div)."""
    k = log2_files
    top = (1 << bits) - 1
    z = zorder_key_sql("na", "nb", bits)
    layout_ctes = []
    layout_rows = []
    for name, bucket in [
        ("bycol_a", f"na // {1 << (bits - k)}"),
        ("bycol_b", f"nb // {1 << (bits - k)}"),
        ("zorder", f"({z}) // {1 << (2 * bits - k)}"),
    ]:
        layout_ctes.append(
            f"""f_{name} AS (
  SELECT {bucket} AS f, MIN(a) AS mna, MAX(a) AS mxa,
         MIN(b) AS mnb, MAX(b) AS mxb,
         COUNT(*) AS nr, SUM(m) AS nm
  FROM base GROUP BY 1
)"""
        )
        layout_rows.append(
            f"""SELECT '{name}' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
           AS files_scanned,
       CAST(SUM(nr) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN scanned THEN nr ELSE 0 END) AS BIGINT)
           AS rows_scanned,
       CAST(SUM(nm) AS BIGINT) AS rows_matching,
       CAST(CASE WHEN COUNT(*) > 0 THEN 1000000 *
            (COUNT(*) - SUM(CASE WHEN scanned THEN 1 ELSE 0 END))
            // COUNT(*) END AS BIGINT) AS file_skip_ppm,
       CAST(CASE WHEN SUM(nr) > 0 THEN 1000000 *
            (SUM(nr) - SUM(CASE WHEN scanned THEN nr ELSE 0 END))
            // SUM(nr) END AS BIGINT) AS row_skip_ppm
FROM (SELECT f_{name}.*,
             mna <= abox_hi AND mxa >= abox_lo AND
             mnb <= bbox_hi AND mxb >= bbox_lo AS scanned
      FROM f_{name}, box)"""
        )
    ctes = ",\n".join(layout_ctes)
    rows = "\nUNION ALL\n".join(layout_rows)
    return f"""
WITH nn AS (
  SELECT CAST({col_a} AS BIGINT) AS a, CAST({col_b} AS BIGINT) AS b
  FROM {table}
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
),
stats AS (
  SELECT MIN(a) AS lo_a, MAX(a) AS hi_a, MIN(b) AS lo_b, MAX(b) AS hi_b
  FROM nn
),
box AS (
  SELECT lo_a + (hi_a - lo_a) * {a_frac[0]} // {a_frac[1]} AS abox_lo,
         lo_a + (hi_a - lo_a) * {a_frac[2]} // {a_frac[3]} AS abox_hi,
         lo_b + (hi_b - lo_b) * {b_frac[0]} // {b_frac[1]} AS bbox_lo,
         lo_b + (hi_b - lo_b) * {b_frac[2]} // {b_frac[3]} AS bbox_hi,
         lo_a, hi_a, lo_b, hi_b
  FROM stats
),
base AS (
  SELECT a, b,
         (a - lo_a) * {top} // GREATEST(hi_a - lo_a, 1) AS na,
         (b - lo_b) * {top} // GREATEST(hi_b - lo_b, 1) AS nb,
         CASE WHEN a BETWEEN abox_lo AND abox_hi
               AND b BETWEEN bbox_lo AND bbox_hi THEN 1 ELSE 0 END AS m
  FROM nn, box
),
{ctes}
SELECT * FROM (
{rows}
)
ORDER BY layout
"""


def upsert_by_key(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Keyed upsert (MERGE-style): union existing + updates, keep the row
    with the greatest ``order_col`` per key (ties → the update side wins
    via a source rank). The incremental fact-maintenance primitive for
    engines without ACID MERGE: one shuffle on the key, no driver state.

    At 100 TB: partition both sides by key (or bucket the base table) so
    the window is co-located; with date-partitioned facts, run per
    partition touched by the update batch — the usual compact-then-swap.
    """
    tagged_e = existing.withColumn("__src", F.lit(0))
    tagged_u = updates.withColumn("__src", F.lit(1))
    merged = tagged_e.unionByName(tagged_u)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    value_col: str,
    effective_date: str,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: rows whose value changed get
    their current version CLOSED (valid_to = effective_date) and a new
    OPEN version appended (valid_from = effective_date, valid_to = null).

    ``dim`` carries (key, value, valid_from, valid_to); only open rows
    (valid_to IS NULL) are candidates for closing. ``changes`` carries
    (key, value). Unchanged values and unknown keys in ``dim`` pass
    through untouched; brand-new keys insert as open rows. The reference
    builds Kimball stars — SCD2 is the standard history-preserving
    maintenance for their dimensions; the date is a parameter so the
    operation is deterministic and oracle-checkable.

    Plan: one keyed join of the dimension against the change set — no
    fact involvement at all. The change side carries no broadcast hint:
    change batches grow with load size, so AQE broadcasts them while
    small and shuffle-joins beyond the threshold (a forced hint would
    OOM on a bulk backfill).

    Precondition: ``changes`` must have at most one row per key (duplicate
    change rows would fan the open version out); the join below asserts
    this cheaply by deduplicating and counting would be a shuffle, so we
    rely on the caller — SCD batches are keyed by construction.

    Null semantics: the change-detection comparison is null-SAFE. An open
    row whose current value is NULL and whose incoming value is non-null
    is a real change (closed + re-opened), not a silent drop. An incoming
    NULL is indistinguishable from "no change row matched" after the left
    join, so NULL updates are treated as no-ops by design.
    """
    open_rows = dim.filter(F.col("valid_to").isNull())
    closed_rows = dim.filter(F.col("valid_to").isNotNull())
    ch = changes.select(
        F.col(key_col), F.col(value_col).alias("__new_value")
    )
    joined = open_rows.join(ch, on=key_col, how="left")
    # eqNullSafe: `__new_value != value_col` would be NULL when the open
    # row's value is NULL, making the row vanish from BOTH branches below.
    changed = F.col("__new_value").isNotNull() & ~F.col(
        "__new_value"
    ).eqNullSafe(F.col(value_col))
    kept_open = joined.filter(~changed).drop("__new_value")
    now_closed = (
        joined.filter(changed)
        .withColumn("valid_to", F.lit(effective_date).cast("date"))
        .drop("__new_value")
    )
    new_versions = (
        joined.filter(changed)
        .select(
            F.col(key_col),
            F.col("__new_value").alias(value_col),
            F.lit(effective_date).cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
        )
    )
    brand_new = (
        ch.join(dim.select(key_col).distinct(), on=key_col, how="left_anti")
        .select(
            F.col(key_col),
            F.col("__new_value").alias(value_col),
            F.lit(effective_date).cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
        )
    )
    return (
        closed_rows.unionByName(kept_open)
        .unionByName(now_closed)
        .unionByName(new_versions)
        .unionByName(brand_new)
    )


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    target_rows_per_task: int = 1_000_000,
    top_n: int = 10,
) -> DataFrame:
    """Pre-flight shuffle-skew diagnosis: the top-N hottest keys with the
    salt factor that would bound their per-task row count.

    At 100 TB the difference between a 2-hour job and a dead one is a
    single hot key; this report is the measurement that decides between
    plain groupBy, :func:`salted_grouped_sum`, and AQE skew-join hints.
    One map-side-combined count per key (the same shuffle the real agg
    would do, minus the payload), a 1-row total broadcast back into the
    plan, and a top-N — output is N rows whatever the input.

    Columns: key cols, ``cnt``, ``share_ppm`` (integer parts-per-million
    of all rows), ``salt_factor`` = ceil(cnt / target_rows_per_task) —
    the ``n_salts`` that keeps every partial group under target.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total_rows"))
    t = target_rows_per_task
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share_ppm", F.expr("div(cnt * 1000000, total_rows)"))
        .withColumn("salt_factor", F.expr(f"div(cnt + {t - 1}, {t})"))
        .orderBy(F.col("cnt").desc(), *key_cols)
        .limit(top_n)
    )


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    rate: float = 0.05,
    salt: str = "jce",
) -> DataFrame:
    """Pre-flight estimate of an equi-join's OUTPUT row count — the
    "how big is this shuffle's result" question a planner must answer
    before committing 1000 executors to a plan. True size is
    Σ_k f_L(k)·f_R(k); sampling ROWS underestimates it quadratically,
    so this samples KEYS: the md5 hash gate (:mod:`sampling`) keeps a
    deterministic ``rate`` fraction of the KEY SPACE on BOTH sides
    (same gate ⇒ same keys), computes the exact per-key product over
    the sampled keys, and scales by 1/rate. E[Σ_{k∈sample} f_L f_R]/r
    = true size — unbiased whatever the key-frequency correlation,
    which row sampling gets wrong.

    Scale shape: each side aggregates map-side to (key, cnt) AFTER the
    sample gate prunes ~(1−rate) of rows pre-shuffle; the sampled-key
    equi-join is tiny. One number out. Deterministic gate ⇒ exactly
    SQL-replayable (the estimate itself is proven by the oracle, and
    the entry carries the exact count beside it so the row shows the
    estimation error).

    Returns one row: ``(sampled_keys, est_pairs, exact_pairs,
    err_ppm)``."""
    from xml_to_parquet_spark.functions.sampling import (
        hex_threshold,
        sample_key,
    )

    thr = hex_threshold(rate)

    def counts(df: DataFrame, alias: str, gated: bool) -> DataFrame:
        out = df.select(F.col(key_col).alias("k"))
        if gated:
            out = out.filter(
                sample_key(F.col("k"), salt) < F.lit(thr)
            )
        return out.groupBy("k").agg(F.count(F.lit(1)).alias(alias))

    inv_num, inv_den = 10**6, int(rate * 10**6)  # exact 1/rate as ppm
    sampled = (
        counts(left, "cl", True)
        .join(counts(right, "cr", True), "k")
        .agg(
            F.count(F.lit(1)).alias("sampled_keys"),
            F.sum(F.col("cl") * F.col("cr")).alias("s"),
        )
        .select(
            "sampled_keys",
            F.expr(f"div(s * {inv_num}, {inv_den})").alias("est_pairs"),
        )
    )
    exact = (
        counts(left, "cl", False)
        .join(counts(right, "cr", False), "k")
        .agg(F.sum(F.col("cl") * F.col("cr")).alias("exact_pairs"))
    )
    return (
        sampled.crossJoin(F.broadcast(exact))
        .select(
            "sampled_keys",
            "est_pairs",
            "exact_pairs",
            F.expr(
                "div(abs(est_pairs - exact_pairs) * 1000000, exact_pairs)"
            ).alias("err_ppm"),
        )
    )


def join_cardinality_estimate_sql(
    left_table: str,
    right_table: str,
    key_col: str,
    rate: float = 0.05,
    salt: str = "jce",
) -> str:
    """DuckDB replay of :func:`join_cardinality_estimate`."""
    from xml_to_parquet_spark.functions.sampling import hex_threshold

    thr = hex_threshold(rate)
    inv_num, inv_den = 10**6, int(rate * 10**6)
    gate = (
        f"substr(md5(CAST({key_col} AS VARCHAR) || ':{salt}'), 1, 6) "
        f"< '{thr}'"
    )
    return f"""
WITH sl AS (SELECT {key_col} AS k, CAST(count(*) AS BIGINT) AS cl
            FROM {left_table} WHERE {gate} GROUP BY 1),
sr AS (SELECT {key_col} AS k, CAST(count(*) AS BIGINT) AS cr
       FROM {right_table} WHERE {gate} GROUP BY 1),
s AS (SELECT CAST(count(*) AS BIGINT) AS sampled_keys,
             CAST(sum(cl * cr) AS BIGINT) AS ssum
      FROM sl JOIN sr USING (k)),
el AS (SELECT {key_col} AS k, CAST(count(*) AS BIGINT) AS cl
       FROM {left_table} GROUP BY 1),
er AS (SELECT {key_col} AS k, CAST(count(*) AS BIGINT) AS cr
       FROM {right_table} GROUP BY 1),
e AS (SELECT CAST(sum(cl * cr) AS BIGINT) AS exact_pairs
      FROM el JOIN er USING (k))
SELECT sampled_keys, ssum * {inv_num} // {inv_den} AS est_pairs,
       exact_pairs,
       abs(ssum * {inv_num} // {inv_den} - exact_pairs) * 1000000
         // exact_pairs AS err_ppm
FROM s, e
"""


def materialize_grouped_agg(
    df: DataFrame, group_cols: list[str], measure: str
) -> DataFrame:
    """The maintained-aggregate state for :func:`refresh_grouped_agg`:
    per group ``(n BIGINT, m_sum DECIMAL(38,2))``. The sum stays DECIMAL
    (exact, associative) so incremental merges are bit-identical to full
    recomputes; render to double only at presentation time."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(measure).cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("m_sum"),
    )


def refresh_grouped_agg(
    spark,
    root: str,
    prev: DataFrame,
    group_cols: list[str],
    measure: str,
    v_from,
    v_to=None,
) -> DataFrame:
    """Incremental materialized-view maintenance from the change feed —
    the O(delta) refresh a 100 TB rollup needs: instead of rescanning
    the table, read only ``diff_published(root, v_from, v_to)`` (for
    append chains that is JUST the new data dirs — zero base scan, the
    q94 fast path) and fold signed per-group deltas into the previous
    aggregate state:

        n'     = n + Σ sign          (insert: +1, delete: −1)
        m_sum' = m_sum + Σ sign·m    (DECIMAL — exact, associative)

    Count-sum algebra is the textbook self-maintainable aggregate family
    (COUNT/SUM; AVG derives as m_sum/n at read time); groups whose count
    reaches zero are dropped, groups born in the delta appear via the
    full-outer join. The identity ``refresh(prev, delta) ==
    materialize(full table)`` is exact — decimal addition is associative
    — and IS the oracle of the catalog entry.

    Shape: one groupBy over the DELTA (∝ changed rows), one
    group-keyed full-outer join against the state (state is
    dimension-sized; AQE broadcasts small deltas)."""
    from xml_to_parquet_spark.sinks.publish import diff_published

    delta = diff_published(spark, root, v_from, v_to)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    d = delta.groupBy(*group_cols).agg(
        F.sum(sign).alias("dn"),
        F.sum(
            sign.cast("decimal(18,2)") * F.col(measure).cast("decimal(18,2)")
        )
        .cast("decimal(38,2)")
        .alias("dm"),
    )
    p = prev.select(
        *group_cols, F.col("n").alias("pn"), F.col("m_sum").alias("pm")
    )
    merged = p.join(d, on=group_cols, how="full_outer").select(
        *group_cols,
        (F.coalesce("pn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (
            F.coalesce(F.col("pm"), F.lit(0).cast("decimal(38,2)"))
            + F.coalesce(F.col("dm"), F.lit(0).cast("decimal(38,2)"))
        )
        .cast("decimal(38,2)")
        .alias("m_sum"),
    )
    return merged.filter(F.col("n") > 0)
