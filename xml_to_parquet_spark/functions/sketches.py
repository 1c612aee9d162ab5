"""Mergeable cardinality / frequency sketches, integer-exact.

The reference has no sketch surface (its profiling is exact counts over
single files, schema_analyzer.R:47); at 100 TB, *fixed-size mergeable*
summaries are a first-class operator family — COUNT(DISTINCT) over a
trillion keys is a full shuffle of every key, while a sketch shuffles a
few KB per group and merges associatively (partial aggregation does the
map-side combine for free).

Three classic sketches, each expressed so Spark and the DuckDB oracle
compute bit-identical BIGINT results (no floats anywhere):

- **KMV (k-minimum-values)**: keep the k smallest 52-bit key hashes per
  group; estimate distinct = (k-1)·2^52 // kth_min. The k-smallest pass
  is a WindowGroupLimit top-k over the *distinct* (group, hash) set, so
  shuffle size ∝ distinct keys once, then k rows per group.
- **HyperLogLog**: 64 registers (p=6) holding max leading-zero ranks of
  a 48-bit hash suffix; harmonic estimate via a single BIGINT division
  ``div(CONST_E, S)`` where S = Σ 2^(49-M_j) is an exact integer and
  CONST_E folds α_m·m²·2^49/10^6 at compile time (the identity
  a//(b·c) == (a//b)//c keeps it exact — floor of a *decimal* division
  is NOT cross-engine-safe: DuckDB rounds the quotient at result scale
  before FLOOR, measured off-by-one at S=64). Small-range linear
  counting m·ln(m/V) is a baked 64-entry integer table, so the full
  published algorithm runs in integer arithmetic.
- **Count-min**: d=3 salted hash rows × w=1024 buckets of token counts;
  point estimate = min over rows. The sketch build is one map-side-
  combined groupBy over (row, bucket) — 3·1024 cells regardless of
  corpus size — and probes are a broadcast join against those cells.

Rank extraction (leading zeros) is done on the md5 *hex string* with a
regexp + one nibble CASE, identical in both engines — no log2 floats
and no bit_length builtin needed.

All hash math stays below 2^53 so every product fits BIGINT under ANSI
semantics; divisions are integer ``div`` (Spark) / ``//`` (DuckDB),
both truncating, with every operand non-negative.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- shared constants (baked into both the Spark plan and the oracle SQL) --

KMV_K = 64
HASH52_MAX = 1 << 52  # 13 hex digits

HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
HLL_W_HEX = 12  # 48-bit rank-source suffix, ranks in 1..49
_ALPHA_PPM = 709253  # round(1e6 * 0.7213/(1 + 1.079/64))
# E = alpha * m^2 * 2^49 / S, folded to one BIGINT division:
# (alpha_ppm*m^2*2^49) // (1e6*S)  ==  ((alpha_ppm*m^2*2^49)//1e6) // S
HLL_CONST_E = (_ALPHA_PPM * HLL_M * HLL_M * (1 << 49)) // 10**6
# linear counting m*ln(m/V), rounded, V=1..m (V=m -> 0)
HLL_LINEAR = [round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]
HLL_SMALL_RANGE = (5 * HLL_M) // 2  # use linear counting below this

CM_DEPTH = 3
CM_WIDTH = 1024


def md5_hash52(col: Column) -> Column:
    """First 13 hex digits of MD5 as a 52-bit non-negative bigint.

    DuckDB twin: CAST('0x'||substr(md5(x),1,13) AS BIGINT).
    """
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("long")


def _md5_hash52_sql(expr: str) -> str:
    return f"CAST('0x'||substr(md5({expr}),1,13) AS BIGINT)"


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------

def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV distinct estimate next to the exact distinct count.

    Plan shape (the 100 TB path): one distinct over (group, hash) — the
    only corpus-sized shuffle — then a rank-k filter that Spark rewrites
    to WindowGroupLimit (k rows per group survive the partial), and a
    broadcast-joined exact count for the comparison column. The sketch
    state per group is k longs, mergeable by keeping the k smallest of
    any union of sketches.
    """
    from xml_to_parquet_spark.operators.window import grouped_topk

    h = md5_hash52(F.col(key_col))
    hashed = df.select(*group_cols, h.alias("h")).distinct()
    topk = grouped_topk(
        hashed,
        group_cols=group_cols,
        order_cols=[F.col("h").asc()],
        k=k,
    )
    sk = topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("kth_min"),
    )
    exact = hashed.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch")
    ).otherwise(F.expr(f"div({(k - 1) * HASH52_MAX}L, kth_min)"))
    return (
        sk.join(F.broadcast(exact), on=group_cols)
        .withColumn("est_distinct", est.cast("long"))
    )


def kmv_distinct_sql(
    table: str,
    key_expr: str,
    group_cols: list[str],
    k: int = KMV_K,
    with_ctes: str = "",
) -> str:
    """Oracle twin; ``with_ctes`` prepends caller CTEs (e.g. the token
    stream) into the single WITH clause — SQL forbids nested WITH."""
    g = ", ".join(group_cols)
    pre = f"{with_ctes}," if with_ctes else ""
    return f"""
WITH {pre} hashed AS (
  SELECT DISTINCT {g}, {_md5_hash52_sql(key_expr)} AS h FROM {table}
),
ranked AS (
  SELECT {g}, h,
         ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h) AS rnk
  FROM hashed
),
sk AS (
  SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_sketch,
         MAX(h) AS kth_min
  FROM ranked WHERE rnk <= {k} GROUP BY {g}
),
exact AS (
  SELECT {g}, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM hashed GROUP BY {g}
)
SELECT sk.*, exact.exact_distinct,
       CAST(CASE WHEN n_sketch < {k} THEN n_sketch
                 ELSE {(k - 1) * HASH52_MAX} // kth_min END
            AS BIGINT) AS est_distinct
FROM sk JOIN exact USING ({g})
"""


def kmv_set_algebra(
    df: DataFrame,
    key_col: str,
    label_col: str,
    label_a: str,
    label_b: str,
    k: int = KMV_K,
) -> DataFrame:
    """Sketch SET ALGEBRA (r8): distinct estimates for two key sets A, B
    and their UNION, INTERSECTION and Jaccard — computed from two
    fixed-size KMV sketches alone (the theta-sketch trick, public
    DataSketches theory): the k minimum hashes of skA ∪ skB are a
    uniform sample of A ∪ B, so the fraction of them present in BOTH
    sketches estimates |A∩B| / |A∪B|; multiplying by the union estimate
    gives the intersection. One row out:
    ``(n_u, est_a, est_b, est_union, est_inter, jaccard_ppm,
    exact_a, exact_b, exact_union, exact_inter)``.

    Why it matters at 100 TB: "how many distinct tokens/users/urls do
    corpus A and corpus B share" is a cross-corpus question whose exact
    answer costs a full co-shuffle of both key sets; the sketch answer
    costs two already-maintained k-long sketches and O(k) merge work —
    and sketches built independently (per partition, per day, per
    stream batch — see q95) compose into it. All integer arithmetic:
    jaccard as ppm, intersection by integer division, exactly
    SQL-replayable. The only corpus-sized work is the (label, hash)
    distinct; everything downstream is k-row tables."""
    from xml_to_parquet_spark.operators.window import grouped_topk

    h = md5_hash52(F.col(key_col))
    hashed = (
        df.filter(F.col(label_col).isin([label_a, label_b]))
        .select(F.col(label_col).alias("lbl"), h.alias("h"))
        .distinct()
    )
    sk = grouped_topk(
        hashed, group_cols=["lbl"], order_cols=[F.col("h").asc()], k=k
    ).select("lbl", "h")
    # union sketch: k smallest distinct hashes of skA ∪ skB
    u = sk.select("h").distinct().orderBy("h").limit(k)
    ina = sk.filter(F.col("lbl") == label_a).select(
        "h", F.lit(1).alias("in_a")
    )
    inb = sk.filter(F.col("lbl") == label_b).select(
        "h", F.lit(1).alias("in_b")
    )
    flags = (
        u.join(ina, "h", "left")
        .join(inb, "h", "left")
        .agg(
            F.count(F.lit(1)).alias("n_u"),
            F.max("h").alias("kth_u"),
            F.sum(
                F.coalesce(F.col("in_a"), F.lit(0))
                * F.coalesce(F.col("in_b"), F.lit(0))
            ).alias("n_match"),
        )
    )

    def _est(n, kth):
        return F.when(n < k, n).otherwise(
            F.expr(f"div({(k - 1) * HASH52_MAX}L, {kth})")
        )

    per = (
        sk.groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
        .select(
            "lbl", _est(F.col("n"), "kth").cast("long").alias("est")
        )
    )
    est_a = per.filter(F.col("lbl") == label_a).select(
        F.col("est").alias("est_a")
    )
    est_b = per.filter(F.col("lbl") == label_b).select(
        F.col("est").alias("est_b")
    )
    exact = (
        hashed.groupBy()
        .agg(
            F.count_distinct(
                F.when(F.col("lbl") == label_a, F.col("h"))
            ).alias("exact_a"),
            F.count_distinct(
                F.when(F.col("lbl") == label_b, F.col("h"))
            ).alias("exact_b"),
            F.count_distinct("h").alias("exact_union"),
        )
        .withColumn(
            "exact_inter",
            F.col("exact_a") + F.col("exact_b") - F.col("exact_union"),
        )
    )
    out = (
        flags.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(exact))
    )
    out = out.withColumn(
        "est_union", _est(F.col("n_u"), "kth_u").cast("long")
    )
    return out.select(
        F.col("n_u").cast("long").alias("n_u"),
        "est_a",
        "est_b",
        "est_union",
        # integer division to match the oracle's // exactly
        F.expr("div(n_match * est_union, n_u)")
        .cast("long")
        .alias("est_inter"),
        F.expr("div(n_match * 1000000L, n_u)")
        .cast("long")
        .alias("jaccard_ppm"),
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_inter",
    )


def kmv_set_algebra_sql(
    table: str,
    key_expr: str,
    label_expr: str,
    label_a: str,
    label_b: str,
    k: int = KMV_K,
    with_ctes: str = "",
) -> str:
    """Oracle twin of :func:`kmv_set_algebra` (same CTE shape, same
    integer algebra)."""
    pre = f"{with_ctes}," if with_ctes else ""
    est = (
        lambda n, kth: f"CASE WHEN {n} < {k} THEN {n} "
        f"ELSE {(k - 1) * HASH52_MAX} // {kth} END"
    )
    return f"""
WITH {pre} hashed AS (
  SELECT DISTINCT {label_expr} AS lbl,
         {_md5_hash52_sql(key_expr)} AS h
  FROM {table} WHERE {label_expr} IN ('{label_a}', '{label_b}')
),
sk AS (
  SELECT lbl, h FROM (
    SELECT lbl, h,
           ROW_NUMBER() OVER (PARTITION BY lbl ORDER BY h) AS rnk
    FROM hashed
  ) WHERE rnk <= {k}
),
u AS (SELECT DISTINCT h FROM sk ORDER BY h LIMIT {k}),
flags AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_u, MAX(h) AS kth_u,
         CAST(SUM(CASE WHEN EXISTS (
                    SELECT 1 FROM sk WHERE lbl = '{label_a}' AND sk.h = u.h
                  ) AND EXISTS (
                    SELECT 1 FROM sk WHERE lbl = '{label_b}' AND sk.h = u.h
                  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_match
  FROM u
),
per AS (
  SELECT lbl, CAST({est('COUNT(*)', 'MAX(h)')} AS BIGINT) AS est
  FROM sk GROUP BY lbl
),
exact AS (
  SELECT CAST(COUNT(DISTINCT CASE WHEN lbl = '{label_a}' THEN h END)
              AS BIGINT) AS exact_a,
         CAST(COUNT(DISTINCT CASE WHEN lbl = '{label_b}' THEN h END)
              AS BIGINT) AS exact_b,
         CAST(COUNT(DISTINCT h) AS BIGINT) AS exact_union
  FROM hashed
)
SELECT flags.n_u,
       (SELECT est FROM per WHERE lbl = '{label_a}') AS est_a,
       (SELECT est FROM per WHERE lbl = '{label_b}') AS est_b,
       CAST({est('flags.n_u', 'flags.kth_u')} AS BIGINT) AS est_union,
       CAST((flags.n_match *
             CAST({est('flags.n_u', 'flags.kth_u')} AS BIGINT))
            // flags.n_u AS BIGINT) AS est_inter,
       flags.n_match * 1000000 // flags.n_u AS jaccard_ppm,
       exact.exact_a, exact.exact_b, exact.exact_union,
       CAST(exact.exact_a + exact.exact_b - exact.exact_union AS BIGINT)
         AS exact_inter
FROM flags, exact
"""


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _hll_rank(w_hex: Column) -> Column:
    """1 + leading-zero bits of the 48-bit value behind 12 hex digits."""
    z = F.length(F.regexp_extract(w_hex, "^(0*)", 1))
    nib = F.conv(F.substring(w_hex, z + 1, 1), 16, 10).cast("int")
    extra = (
        F.when(nib >= 8, 0)
        .when(nib >= 4, 1)
        .when(nib >= 2, 2)
        .otherwise(3)
    )
    return F.when(
        z == HLL_W_HEX, F.lit(4 * HLL_W_HEX + 1)
    ).otherwise(z * 4 + extra + 1)


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL estimate (64 registers) next to the exact count.

    The register table is the sketch: m rows per group, built by one
    map-side-combined max-agg — shuffle bytes ∝ groups·m, independent
    of corpus size, and two sketches merge by register-wise MAX. The
    harmonic estimate and the small-range linear-counting correction
    are single BIGINT expressions over that table (constants folded at
    compile time; see module docstring for why no decimal division).
    """
    md5 = F.md5(F.col(key_col).cast("string"))
    reg = (F.conv(F.substring(md5, 1, 2), 16, 10).cast("int") % HLL_M)
    rank = _hll_rank(F.substring(md5, 3, HLL_W_HEX))
    regs = (
        df.select(*group_cols, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("mr"))
    )
    # Absent registers (rank 0) fold in ALGEBRAICALLY: every present
    # register has rank ≥ 1, so v_zero = m − |present| and each absent
    # one contributes exactly 2^49 to S — no need to materialize the
    # m-row grid (an explode + left join this replaced; measured a full
    # extra shuffle stage at sf0.1).
    summed = regs.groupBy(*group_cols).agg(
        (
            F.sum(F.expr("shiftleft(1L, cast(49 - mr AS int))"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << 49)
        ).alias("s_sum"),
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("long").alias("v_zero"),
    )
    est_raw = F.expr(f"div({HLL_CONST_E}L, s_sum)")
    linear_map = F.create_map(
        *[F.lit(x) for v in range(1, HLL_M + 1) for x in (v, HLL_LINEAR[v - 1])]
    )
    est = F.when(
        (F.col("v_zero") > 0) & (est_raw <= HLL_SMALL_RANGE),
        F.element_at(linear_map, F.col("v_zero").cast("int")).cast("long"),
    ).otherwise(est_raw.cast("long"))
    exact = (
        df.select(*group_cols, F.col(key_col).cast("string").alias("k"))
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    return (
        summed.withColumn("est_distinct", est)
        .join(F.broadcast(exact), on=group_cols)
    )


def hll_distinct_sql(
    table: str, key_expr: str, group_cols: list[str], with_ctes: str = ""
) -> str:
    """Oracle twin; ``with_ctes`` as in :func:`kmv_distinct_sql`."""
    g = ", ".join(group_cols)
    linear_case = " ".join(
        f"WHEN {v} THEN {HLL_LINEAR[v - 1]}" for v in range(1, HLL_M + 1)
    )
    pre = f"{with_ctes}," if with_ctes else ""
    return f"""
WITH {pre} h AS (
  SELECT {g}, md5(CAST({key_expr} AS VARCHAR)) AS hx FROM {table}
),
ranked AS (
  SELECT {g},
         CAST('0x'||substr(hx,1,2) AS INTEGER) % {HLL_M} AS reg,
         CASE WHEN length(regexp_extract(substr(hx,3,{HLL_W_HEX}), '^(0*)', 1))
                   = {HLL_W_HEX} THEN {4 * HLL_W_HEX + 1}
              ELSE length(regexp_extract(substr(hx,3,{HLL_W_HEX}), '^(0*)', 1)) * 4
                   + (CASE WHEN CAST('0x'||substr(substr(hx,3,{HLL_W_HEX}),
                          length(regexp_extract(substr(hx,3,{HLL_W_HEX}), '^(0*)', 1)) + 1, 1)
                          AS INTEGER) >= 8 THEN 0
                       WHEN CAST('0x'||substr(substr(hx,3,{HLL_W_HEX}),
                          length(regexp_extract(substr(hx,3,{HLL_W_HEX}), '^(0*)', 1)) + 1, 1)
                          AS INTEGER) >= 4 THEN 1
                       WHEN CAST('0x'||substr(substr(hx,3,{HLL_W_HEX}),
                          length(regexp_extract(substr(hx,3,{HLL_W_HEX}), '^(0*)', 1)) + 1, 1)
                          AS INTEGER) >= 2 THEN 2
                       ELSE 3 END) + 1
         END AS rank
  FROM h
),
regs AS (
  SELECT {g}, reg, MAX(rank) AS mr FROM ranked GROUP BY {g}, reg
),
summed AS (
  SELECT {g},
         CAST(SUM(CAST(1 AS BIGINT) << (49 - mr))
              + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 49)
              AS BIGINT) AS s_sum,
         CAST({HLL_M} - COUNT(*) AS BIGINT) AS v_zero
  FROM regs GROUP BY {g}
),
exact AS (
  SELECT {g}, CAST(COUNT(DISTINCT CAST({key_expr} AS VARCHAR)) AS BIGINT)
              AS exact_distinct
  FROM {table} GROUP BY {g}
)
SELECT summed.{", summed.".join(group_cols)}, s_sum, v_zero,
       CAST(CASE WHEN v_zero > 0 AND {HLL_CONST_E} // s_sum <= {HLL_SMALL_RANGE}
                 THEN CASE v_zero {linear_case} END
                 ELSE {HLL_CONST_E} // s_sum END AS BIGINT) AS est_distinct,
       exact_distinct
FROM summed JOIN exact USING ({g})
"""


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------

def countmin_sketch_counts(
    counts: DataFrame,
    token_col: str = "token",
    cnt_col: str = "cnt",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the d×w counter table from a pre-aggregated (token, cnt)
    table — the generator then emits d rows per DISTINCT token (vocab ≪
    token positions), and callers that already need per-token counts
    (e.g. for a paired exact column) share one corpus pass. Returns
    (row, bucket, cnt) with ≤ d·w rows whatever the corpus size.
    """
    rows = counts.select(
        F.col(token_col).alias("token"),
        F.col(cnt_col).alias("cnt"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    bucket = (
        md5_hash52(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("token")))
        % width
    )
    return (
        rows.select("row", bucket.alias("bucket"), "cnt")
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def countmin_sketch(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the d×w counter table from a raw token stream: one
    map-side-combined per-token count (the only corpus-sized shuffle,
    bytes ∝ vocab) feeding :func:`countmin_sketch_counts`."""
    counts = tokens.groupBy(F.col(token_col).alias("token")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return countmin_sketch_counts(counts, depth=depth, width=width)


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-estimate counts for probe tokens: min over the d rows.

    The sketch side is broadcast — it is ≤ d·w cells by construction,
    the whole point of the summary — so probing never shuffles; absent
    (row,bucket) cells are zero, so a probe whose bucket was never
    touched estimates 0 via the left join + coalesce.
    """
    pr = probes.select(
        F.col(token_col).alias("token"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    bucket = (
        md5_hash52(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("token")))
        % width
    )
    keyed = pr.select("token", "row", bucket.alias("bucket"))
    joined = keyed.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
    return joined.groupBy("token").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_cnt")
    )


HIST_FRAC_BITS = 4  # bucket width 2^(1/16): relative error ≤ 4.4%


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: list[int] = (50, 90, 99),
) -> DataFrame:
    """Mergeable quantile sketch: dyadic log-bucket histogram, integer-
    exact, completing the sketch family (distinct / frequency /
    membership / **quantile**).

    Bucket = ``ilog2_1024(v) >> 6`` (1/16-bit resolution); the sketch
    state per group is (cnt, vmin) per OCCUPIED bucket — ≤ ~16·64 rows
    for the full positive-bigint range, mergeable by (sum, min). The
    q-th percentile estimate is the min value in the first bucket whose
    cumulative count reaches ``ceil(n·q/100)`` — a LOWER bound of the
    true quantile within one bucket width (≤ 2^(1/16)−1 ≈ 4.4 %
    relative error). Exact quantiles (the same ceil-position
    definition, computed from a per-group sort) ride along so the row
    shows the error. Values must be ≥ 1 (log buckets).

    Scale shape: the sketch build is ONE map-side-combined groupBy
    (shuffle bytes ∝ groups × occupied buckets, corpus-independent);
    the selection is a window + conditional min over that bounded
    table. The exact columns are the sf-demo comparison only — at
    100 TB you run the sketch INSTEAD of the sort, that's the point.
    Everything (including the ceil) is integer compares
    (``100·cum ≥ q·n``), bit-identical in both engines.
    """
    from pyspark.sql import Window

    from xml_to_parquet_spark.functions.retrieval import ilog2_1024_spark

    v = df.select(*group_cols, F.col(value_col).cast("long").alias("v"))
    bucketed = v.withColumn(
        "bucket", F.expr(f"{ilog2_1024_spark('v')} >> 6")
    )
    cells = bucketed.groupBy(*group_cols, "bucket").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("v").alias("vmin")
    )
    w_ord = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    c2 = cells.withColumn("cum", F.sum("cnt").over(w_ord)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    est_aggs = [
        F.min(
            F.when(100 * F.col("cum") >= q * F.col("n"), F.col("vmin"))
        ).alias(f"p{q}_est")
        for q in qs
    ]
    sk = c2.groupBy(*group_cols).agg(
        F.max("n").cast("long").alias("n"), *est_aggs
    )
    # exact twin: value at the ceil position of the per-group sort —
    # min(value | 100·rn ≥ q·n) picks exactly that row
    w_rn = Window.partitionBy(*group_cols).orderBy("v")
    ranked = v.withColumn("rn", F.row_number().over(w_rn)).withColumn(
        "n", F.count(F.lit(1)).over(w_all)
    )
    exact_aggs = [
        F.min(
            F.when(100 * F.col("rn") >= q * F.col("n"), F.col("v"))
        ).alias(f"p{q}_exact")
        for q in qs
    ]
    exact = ranked.groupBy(*group_cols).agg(*exact_aggs)
    return sk.join(exact, on=group_cols)


def histogram_quantiles_sql(
    table: str,
    value_expr: str,
    group_cols: list[str],
    qs: list[int] = (50, 90, 99),
) -> str:
    """DuckDB oracle twin of :func:`histogram_quantiles`."""
    from xml_to_parquet_spark.functions.retrieval import ilog2_1024_duck

    g = ", ".join(group_cols)
    est_cols = ", ".join(
        f"MIN(CASE WHEN 100 * cum >= {q} * n THEN vmin END) AS p{q}_est"
        for q in qs
    )
    exact_cols = ", ".join(
        f"MIN(CASE WHEN 100 * rn >= {q} * n THEN v END) AS p{q}_exact"
        for q in qs
    )
    return f"""
WITH vals AS (
  SELECT {g}, CAST({value_expr} AS BIGINT) AS v FROM {table}
),
bucketed AS (
  SELECT {g}, v, {ilog2_1024_duck("v")} >> 6 AS bucket FROM vals
),
cells AS (
  SELECT {g}, bucket, CAST(COUNT(*) AS BIGINT) AS cnt, MIN(v) AS vmin
  FROM bucketed GROUP BY {g}, bucket
),
c2 AS (
  SELECT {g}, bucket, cnt, vmin,
         SUM(cnt) OVER (PARTITION BY {g} ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY {g}) AS n
  FROM cells
),
sk AS (
  SELECT {g}, CAST(MAX(n) AS BIGINT) AS n, {est_cols}
  FROM c2 GROUP BY {g}
),
ranked AS (
  SELECT {g}, v,
         ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY {g}) AS n
  FROM vals
),
exact AS (
  SELECT {g}, {exact_cols} FROM ranked GROUP BY {g}
)
SELECT sk.*, {", ".join("exact.p%d_exact" % q for q in qs)}
FROM sk JOIN exact USING ({g})
"""


def bloom_positions(
    keys: DataFrame,
    key_col: str,
    m: int = 1 << 13,
    k: int = 4,
) -> DataFrame:
    """Distinct set-bit positions of a Bloom filter over ``keys``.

    One generator (k rows per key) + one distinct — the result is ≤ m
    rows whatever the build side's size, the fixed-size property that
    makes the filter shippable to every task.
    """
    rows = keys.select(
        F.col(key_col).cast("string").alias("key"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    )
    pos = (
        md5_hash52(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("key")))
        % m
    )
    return rows.select(pos.alias("pos")).distinct()


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    m: int = 1 << 13,
    k: int = 4,
) -> str:
    """Materialize the filter as an m/4-char lowercase hex string.

    The collect is bounded by construction (≤ m position rows — the
    whole point of a Bloom filter is that its size is fixed); hex char
    j holds positions 4j..4j+3 with weight 2^(pos mod 4), so a probe
    is one substring + one nibble AND — row-local, inside codegen.
    This is Spark's own runtime-filter shape (a BloomFilterAggregate
    build side shipped into a might_contain expression), expressed so
    the DuckDB oracle can replay the identical membership semantics.
    """
    if m % 4:
        raise ValueError(f"m must be a multiple of 4, got {m}")
    nib = [0] * (m // 4)
    for row in bloom_positions(keys, key_col, m, k).collect():
        p = row["pos"]
        nib[p // 4] |= 1 << (p % 4)
    return "".join(format(v, "x") for v in nib)


def bloom_might_contain(
    key: Column, bitmap: str, m: int = 1 << 13, k: int = 4
) -> Column:
    """Row-local membership probe against a :func:`bloom_bitmap` string.

    k fixed substring+nibble checks ANDed together — no join, no
    shuffle, whole-stage-codegen friendly; false positives possible
    (rate ≈ fill_fraction^k), false negatives impossible.
    """
    out = F.lit(True)
    for i in range(k):
        pos = md5_hash52(
            F.concat(F.lit(f"{i}:"), key.cast("string"))
        ) % m
        nibble = F.conv(
            F.substring(F.lit(bitmap), (pos / 4).cast("int") + 1, 1), 16, 10
        ).cast("int")
        pm = (pos % 4).cast("int")
        bit = (
            F.when(pm == 0, 1).when(pm == 1, 2).when(pm == 2, 4).otherwise(8)
        )
        out = out & (nibble.bitwiseAND(bit) != 0)
    return out


def bloom_membership_sql(
    build_cte: str,
    probe_key: str,
    m: int = 1 << 13,
    k: int = 4,
) -> str:
    """Membership predicate replay for the oracle: ``probe_key`` might be
    in the filter iff ALL k of its positions appear in the build side's
    distinct position set (CTE ``bpos`` emitted here; the caller embeds
    ``build_cte`` — a single-column ``key`` relation — and correlates
    with this predicate via the fixed probe-position CTE join)."""
    h = "CAST('0x'||substr(md5(CAST(r.i AS VARCHAR)||':'||CAST({key} AS VARCHAR)),1,13) AS BIGINT)"
    build_h = h.format(key="b.key")
    return (
        f"bkeys AS ({build_cte}), "
        f"bpos AS (SELECT DISTINCT {build_h} % {m} AS pos "
        f"FROM bkeys b CROSS JOIN (SELECT unnest(range({k})) AS i) r)"
    )


def countmin_sql(
    toks_cte: str,
    probe_values: list[str],
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> str:
    """Oracle: replay sketch build + probe over a token CTE named toks."""
    probes = ", ".join(f"('{t}')" for t in probe_values)
    h = _md5_hash52_sql("CAST(r.row AS VARCHAR)||':'||token")
    return f"""
WITH toks AS ({toks_cte}),
cells AS (
  SELECT r.row, {h} % {width} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN (SELECT unnest(range({depth})) AS row) r
  GROUP BY 1, 2
),
probe AS (
  SELECT token, r.row, {h} % {width} AS bucket
  FROM (VALUES {probes}) p(token)
  CROSS JOIN (SELECT unnest(range({depth})) AS row) r
)
SELECT probe.token,
       CAST(MIN(COALESCE(cells.cnt, 0)) AS BIGINT) AS est_cnt
FROM probe LEFT JOIN cells USING (row, bucket)
GROUP BY probe.token
"""


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters (self-certifying two-pass top-k)
# ---------------------------------------------------------------------------


def mg_screen(df: DataFrame, col: str, counters: int) -> DataFrame:
    """The Misra–Gries screen stage of :func:`mg_heavy_hitters`,
    factored out so rungs can measure its shuffle volume directly:
    per-Arrow-batch exact counts trimmed to ≤ ``counters`` summary rows
    (value, c) plus one NULL-value sentinel carrying the batch's exact
    trim slack. Batch size is the tuning knob — summary rows ≈
    counters × batches — raise ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` on huge scans."""
    import pandas as pd

    dt = dict(df.dtypes)[col]
    if dt not in ("string", "bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"mg_heavy_hitters supports string/integral columns, got "
            f"{col}: {dt}"
        )
    out_t = "string" if dt == "string" else "bigint"
    schema = f"value {out_t}, c long, slack long"

    def _screen(batches):
        for pdf in batches:
            s = pdf[col].dropna()
            n = len(s)
            if n == 0:
                continue
            vc = s.value_counts()  # exact, batch-local, descending
            if len(vc) > counters:
                sub = int(vc.iloc[counters])  # (counters+1)-th count
                vc = vc.iloc[:counters] - sub
                vc = vc[vc > 0]
            else:
                sub = 0
            out = vc.rename_axis("value").reset_index(name="c")
            out["slack"] = 0
            # sentinel: exact slack this batch subtracted (value NULL)
            sent = {"value": [None], "c": [0], "slack": [sub]}
            yield pd.concat(
                [out, pd.DataFrame(sent)], ignore_index=True
            )

    return df.select(col).mapInPandas(_screen, schema=schema)


def mg_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    counters: int = 4096,
) -> DataFrame:
    """Exact top-k most frequent values WITHOUT a full-cardinality
    shuffle — the 100 TB replacement for ``GROUP BY col ORDER BY
    count(*) DESC LIMIT k`` when ``col`` has ~10⁹ distinct values
    (URLs, domains, user ids) and the plain plan's shuffle IS the job.

    Two passes:

    1. **Screen** (one scan, mapInPandas): each Arrow batch's exact
       value counts are compressed to a Misra–Gries summary — keep the
       top ``counters`` values, subtract the (counters+1)-th count from
       each (Agarwal et al., "Mergeable Summaries", PODS'12: the trim
       is a valid MG summary, and summaries merge by plain per-item
       SUM). Each batch also emits one sentinel row carrying the exact
       amount it subtracted, so the screen's total slack is TRACKED,
       not bounded: a value absent from every summary has true
       frequency ≤ Σ slack. Shuffle volume: ≤ counters rows per batch
       + one sentinel, regardless of input cardinality.
    2. **Exact recount**: the ≤ counters×batches surviving candidates
       are recounted exactly (semi-join + map-side-combined groupBy —
       few distinct keys, so partial aggregation collapses the shuffle),
       and the top k by (count DESC, value) are returned.

    When to use (measured, tools/hh_rung.py): the win is SHUFFLE BYTES
    — (counters × batches) vs (partitions × distinct) rows on the
    exchange — which is what matters when the exchange crosses a
    network. On local mode the plain groupBy is WALL-faster (localhost
    shuffle is memory-speed and the screen pays the Python/Arrow round
    trip): prefer the plain plan below cluster scale or when distinct
    values per partition are few.

    Self-certifying: the result is provably the exact top-k iff the
    k-th recounted frequency exceeds the screen's total slack (no
    unscreened value can reach the top-k). The operator RAISES when the
    certificate fails — raise ``counters`` — so a returned result is
    never silently approximate, whatever the data distribution or batch
    layout. With distinct(col) ≤ counters the slack is exactly 0. The
    output is therefore batch- and partition-invariant: always the
    exact deterministic top-k (ties broken by value).

    Returns ``(value, cnt, rk)`` ordered by rank; ``value`` keeps the
    input column's type (string or integral).
    """
    from pyspark.sql import Window

    summary = mg_screen(df, col, counters).localCheckpoint(eager=False)
    total_slack = (
        summary.agg(F.sum("slack").alias("s")).collect()[0]["s"] or 0
    )
    cand = (
        summary.filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.sum("c").alias("c"))
        .select("value")
    )
    exact = (
        df.select(F.col(col).alias("value"))
        .filter(F.col("value").isNotNull())
        .join(F.broadcast(cand), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "value")
        .limit(k)
    )
    top = exact.select(
        "value",
        "cnt",
        F.row_number()
        .over(Window.partitionBy(F.lit(0)).orderBy(F.desc("cnt"), "value"))
        .alias("rk"),
    ).localCheckpoint(eager=False)  # ≤ k rows: certificate + return share one recount scan
    rows_kth = top.orderBy(F.desc("rk")).limit(1).collect()
    # certificate: no unscreened value (true frequency ≤ total_slack)
    # can belong in the returned top-k. Two failure shapes: the k-th
    # kept count doesn't clear the slack, or the screen surfaced fewer
    # than k candidates while slack admits unseen values.
    short = (not rows_kth or rows_kth[0]["rk"] < k) and total_slack > 0
    if short or (rows_kth and rows_kth[0]["cnt"] <= total_slack):
        kth = (
            f"k-th count {rows_kth[0]['cnt']} (rank {rows_kth[0]['rk']})"
            if rows_kth
            else "no candidate survived the screen"
        )
        raise ValueError(
            f"heavy-hitter certificate failed: {kth} vs screen slack "
            f"{total_slack}; an unscreened value could enter the "
            f"top-{k} — raise counters (got {counters})"
        )
    return top.orderBy("rk")


def mg_heavy_hitters_sql(table: str, col: str, k: int = 10) -> str:
    """Oracle: the certified result IS the exact top-k, so the oracle
    is the plain exact query with the same deterministic tie-break."""
    return f"""
SELECT {col} AS value, CAST(count(*) AS BIGINT) AS cnt,
       CAST(row_number() OVER (ORDER BY count(*) DESC, {col}) AS INT) AS rk
FROM {table} WHERE {col} IS NOT NULL
GROUP BY {col} ORDER BY cnt DESC, value LIMIT {k}
"""
