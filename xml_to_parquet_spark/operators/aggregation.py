"""Aggregation operators (SURVEY.md §2.4).

Reference parity:
- grouped_multi_agg   R/star_transformer.R:148-165 (A2): group_by(dims) +
                      sum/avg/min/max/count per measure with {col}_{fn} naming
- count_by_group      R/schema_validator.R:200-204, README.md:256-262 (A3)

Determinism note (the driver hash-compares results against a DuckDB oracle):
floating-point SUM/AVG over doubles is summation-order dependent, and Spark's
partition-parallel order differs from DuckDB's. For any result that must be
bit-comparable we compute sums in exact DECIMAL arithmetic (the source data
is 2-decimal currency-style values) and cast to double at the end. The
identical expression shape is used in the oracle SQL, so both engines produce
the exact same doubles. ``dsum``/``davg`` encode that pattern.

At scale: groupBy aggregations are partial-aggregated map-side (Spark does
this automatically for sum/min/max/count), so shuffle volume is proportional
to (groups × measures), not input rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Exact-arithmetic working type for money-style doubles. 2 source decimals;
# precision 38 leaves ~34 integer digits of headroom for the sum, enough for
# 100 TB-scale row counts (1e12 rows × 1e6 values = 1e18 « 1e34).
_DEC = "decimal(18,2)"
_DEC_SUM = "decimal(38,2)"


def dsum(col: str, alias: str | None = None) -> Column:
    """Order-independent SUM of a 2-decimal double column, returned as double.

    sum(cast(x as decimal)) is exact → identical across engines and across
    partitionings; the final cast to double is a single deterministic
    conversion.
    """
    c = F.sum(F.col(col).cast(_DEC)).cast(_DEC_SUM).cast("double")
    return c.alias(alias or f"{col}_sum")


def davg(col: str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum, then one double division."""
    c = F.sum(F.col(col).cast(_DEC)).cast(_DEC_SUM).cast("double") / F.count(
        F.col(col)
    )
    return c.alias(alias or f"{col}_avg")


def dsum_sql(col: str, alias: str | None = None) -> str:
    """DuckDB-side expression matching :func:`dsum` bit-for-bit."""
    return (
        f"CAST(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)"
        f" AS {alias or f'{col}_sum'}"
    )


def davg_sql(col: str, alias: str | None = None) -> str:
    """DuckDB-side expression matching :func:`davg` bit-for-bit."""
    return (
        f"CAST(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)"
        f" / COUNT({col}) AS {alias or f'{col}_avg'}"
    )


def grouped_multi_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    measure_cols: Sequence[str],
    fns: Sequence[str] = ("sum", "avg", "min", "max", "count"),
) -> DataFrame:
    """Grouped multi-measure aggregation with ``{col}_{fn}`` naming (A2).

    Mirrors the reference's aggregate_fact_data: for each measure emit
    sum/avg/min/max/count named ``{measure}_{fn}``. One shuffle on the group
    keys; all five stats share the same exchange.
    """
    aggs: list[Column] = []
    for m in measure_cols:
        for fn in fns:
            if fn == "sum":
                aggs.append(dsum(m))
            elif fn == "avg":
                aggs.append(davg(m))
            elif fn == "min":
                aggs.append(F.min(m).alias(f"{m}_min"))
            elif fn == "max":
                aggs.append(F.max(m).alias(f"{m}_max"))
            elif fn == "count":
                aggs.append(F.count(F.col(m)).alias(f"{m}_count"))
            else:
                raise ValueError(f"unsupported aggregate fn: {fn}")
    return df.groupBy(*group_cols).agg(*aggs)


def grouped_multi_agg_sql(
    table: str,
    group_cols: Sequence[str],
    measure_cols: Sequence[str],
    fns: Sequence[str] = ("sum", "avg", "min", "max", "count"),
    order: bool = False,
) -> str:
    """Oracle SQL equivalent of :func:`grouped_multi_agg`."""
    parts: list[str] = list(group_cols)
    for m in measure_cols:
        for fn in fns:
            if fn == "sum":
                parts.append(dsum_sql(m))
            elif fn == "avg":
                parts.append(davg_sql(m))
            elif fn == "min":
                parts.append(f"MIN({m}) AS {m}_min")
            elif fn == "max":
                parts.append(f"MAX({m}) AS {m}_max")
            elif fn == "count":
                parts.append(f"COUNT({m}) AS {m}_count")
    sql = (
        f"SELECT {', '.join(parts)} FROM {table} "
        f"GROUP BY {', '.join(group_cols)}"
    )
    if order:
        sql += f" ORDER BY {', '.join(group_cols)}"
    return sql


def count_by_group(df: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Count-by-group (A3): ``groupBy(k).count()`` with a stable alias."""
    return df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))


def grouped_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    percentiles: dict[str, list[float]],
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group percentiles with an explicit exact/approx switch.

    - ``approx=False``: exact linear-interpolation percentile. Spark's exact
      percentile buffers a value→count map PER GROUP — fine for
      low-cardinality measures (e.g. integer quantities), but for
      near-unique measures the buffer approaches the group's distinct-value
      count in executor memory. This is the ORACLE path (bit-comparable to
      ``quantile_cont``), not the 100 TB path.
    - ``approx=True``: ``approx_percentile`` (KLL-type sketch, bounded
      memory ~O(accuracy), mergeable map-side). Error ≤ 1/accuracy of the
      rank. THE scale path for near-unique measures; results are
      engine-specific, so no exact oracle — verify with tolerance.

    Output columns: ``{col}_p{int(100p)}`` each, e.g. ``price_p50``.
    """
    aggs = []
    for col, ps in percentiles.items():
        for p in ps:
            name = f"{col}_p{int(round(p * 100))}"
            if approx:
                aggs.append(
                    F.approx_percentile(
                        col, F.lit(p), F.lit(accuracy)
                    ).alias(name)
                )
            else:
                aggs.append(F.percentile(col, F.lit(p)).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def funnel_stages(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis (r8): for each stage k, how many users
    reached it — where "reached" means the FIRST qualifying occurrence
    of stage k happened STRICTLY AFTER the user's first qualifying
    occurrence of stage k−1 (the standard product-analytics funnel, a
    MATCH_RECOGNIZE-lite). Output one row per stage:
    ``(stage_idx, stage, n_users, conv_ppm)`` with conversion as integer
    ppm of stage 1's population.

    Plan shape: one filtered min-agg per stage (map-side combinable,
    shuffle keyed on the user — K stages = K cheap passes over the
    pre-filtered event slice, each smaller than the last because it
    joins the survivors of the previous stage). Survivor frames are
    user-count-sized, joined with AQE sizing them (broadcast at small
    SF, shuffle join at 100 TB). No window over the raw stream, no
    per-user event collection — state per user is ONE timestamp per
    stage."""
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    prev = (
        ev.filter(F.col("t") == stages[0])
        .groupBy("u")
        .agg(F.min("ts").alias("ts_0"))
    )
    counts = [prev.count()]
    for i, stage in enumerate(stages[1:], start=1):
        prev = (
            ev.filter(F.col("t") == stage)
            .join(prev, on="u")
            .filter(F.col("ts") > F.col(f"ts_{i - 1}"))
            .groupBy("u", *[f"ts_{j}" for j in range(i)])
            .agg(F.min("ts").alias(f"ts_{i}"))
        )
        counts.append(prev.count())
    spark = df.sparkSession
    base = max(counts[0], 1)
    rows = [
        (i + 1, s, counts[i], counts[i] * 1_000_000 // base)
        for i, s in enumerate(stages)
    ]
    return spark.createDataFrame(
        rows, "stage_idx int, stage string, n_users long, conv_ppm long"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "1 week",
    max_offset: int = 8,
) -> DataFrame:
    """Cohort retention matrix — the product-analytics complement of
    :func:`funnel_stages`: group users by their FIRST-seen time bucket
    (the cohort) and report, for each later bucket offset, how many of
    that cohort were active again, as exact integer ppm of cohort size.

    Shape: one min-agg per user (map-side combined, shuffle keyed on
    user) finds cohorts; distinct (user, bucket) activity pairs join
    user→cohort (user-keyed equi-join, AQE-splittable); one
    map-side-combined groupBy over (cohort, offset) — shuffle ∝
    cohorts × offsets, corpus-independent. Offsets beyond ``max_offset`` are
    filtered (a report window, not a histogram tail); offset 0 is the
    cohort itself (retention_ppm = 1e6 by construction — kept as the
    sanity row).

    Returns ``(cohort_start, bucket_offset, cohort_n, active_n,
    retention_ppm)`` ordered by cohort then offset. Bucket arithmetic is
    epoch-second integer division by the bucket length, so the oracle
    replays it without timezone/calendar ambiguity. Unsupported bucket
    strings raise ValueError naming the allowed values (shared rule with
    drift.bucket_anomalies)."""
    from xml_to_parquet_spark.functions.drift import (
        bucket_seconds,
        epoch_bucket_sql,
    )

    secs = bucket_seconds(bucket)
    b = F.expr(epoch_bucket_sql(ts_col, secs))
    firsts = (
        df.groupBy(F.col(user_col).alias("u"))
        .agg(F.min(b.cast("long")).alias("cohort_b"))
    )
    activity = df.select(
        F.col(user_col).alias("u"), b.cast("long").alias("act_b")
    ).distinct()
    cohort_sizes = firsts.groupBy("cohort_b").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    joined = (
        activity.join(firsts, "u")
        .withColumn("bucket_offset", F.col("act_b") - F.col("cohort_b"))
        .filter(F.col("bucket_offset") <= max_offset)
        .groupBy("cohort_b", "bucket_offset")
        .agg(F.count(F.lit(1)).alias("active_n"))
    )
    return (
        joined.join(cohort_sizes, "cohort_b")
        .select(
            F.from_unixtime(F.col("cohort_b") * secs).alias("cohort_start"),
            F.col("bucket_offset"),
            F.col("cohort_n"),
            F.col("active_n"),
            F.expr("div(active_n * 1000000L, cohort_n)").alias(
                "retention_ppm"
            ),
        )
        .orderBy("cohort_start", "bucket_offset")
    )


def cohort_retention_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "1 week",
    max_offset: int = 8,
) -> str:
    """Oracle twin of :func:`cohort_retention` — same epoch-bucket
    integer arithmetic, same distinct-activity semantics."""
    from xml_to_parquet_spark.functions.drift import (
        bucket_seconds,
        floor_div_duck,
    )

    secs = bucket_seconds(bucket)
    b = floor_div_duck(
        f"CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)", secs
    )
    return f"""
WITH firsts AS (
  SELECT {user_col} AS u, MIN({b}) AS cohort_b FROM {table} GROUP BY 1
),
activity AS (
  SELECT DISTINCT {user_col} AS u, {b} AS act_b FROM {table}
),
sizes AS (SELECT cohort_b, COUNT(*) AS cohort_n FROM firsts GROUP BY 1),
cells AS (
  SELECT f.cohort_b, a.act_b - f.cohort_b AS boff, COUNT(*) AS active_n
  FROM activity a JOIN firsts f USING (u)
  WHERE a.act_b - f.cohort_b <= {max_offset}
  GROUP BY 1, 2
)
SELECT strftime(to_timestamp(cohort_b * {secs}), '%Y-%m-%d %H:%M:%S')
         AS cohort_start,
       CAST(boff AS BIGINT) AS bucket_offset,
       CAST(cohort_n AS BIGINT) AS cohort_n,
       CAST(active_n AS BIGINT) AS active_n,
       CAST(active_n * 1000000 // cohort_n AS BIGINT) AS retention_ppm
FROM cells JOIN sizes USING (cohort_b)
ORDER BY cohort_start, bucket_offset
"""


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """First-order event-transition matrix (r9): for every ordered pair
    of event types (src, dst), how often a user's event of type src was
    IMMEDIATELY followed by one of type dst in that user's own timeline
    — the Markov-chain view of behavior streams (sessionization's
    complement: q45 cuts timelines into sessions, this summarizes the
    step dynamics inside them).

    Per-user ordering is (ts, order_col) so timestamp ties are broken
    deterministically by the unique event id — both engines replay the
    identical sequence. A user's last event has no successor and emits
    no row (no END sentinel: absorbing-state rows are derivable as
    src_n minus outgoing mass, and a sentinel would double the pair
    space for no information).

    Plan shape: ONE shuffle keyed on the user for the lead() window
    (Spark sorts within partitions; no per-user collection — window
    state is one row of lookahead), then a map-side-combined groupBy
    over (src, dst) — shuffle ∝ distinct type pairs (≤ |types|²,
    corpus-independent). Source totals and row probabilities come from
    a window over the PAIR table (|types|²-sized, trivially in-memory),
    never a second pass over events. Returns
    ``(src, dst, n, row_total, p_ppm)`` with p_ppm the exact integer
    row-conditional probability, ordered by (src, dst).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    pairs = (
        df.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(order_col),
            F.col(type_col).alias("src"),
        )
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("src")
    return (
        pairs.withColumn("row_total", F.sum("n").over(wt))
        .select(
            "src",
            "dst",
            "n",
            "row_total",
            F.expr("div(n * 1000000L, row_total)").alias("p_ppm"),
        )
        .orderBy("src", "dst")
    )


def event_transitions_sql(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> str:
    """Oracle twin of :func:`event_transitions` — same deterministic
    (ts, id) ordering, same strict next-event pairing, same integer
    row-conditional ppm."""
    return f"""
WITH seq AS (
  SELECT {type_col} AS src,
         LEAD({type_col}) OVER (
           PARTITION BY {user_col} ORDER BY {ts_col}, {order_col}
         ) AS dst
  FROM {table}
),
pairs AS (
  SELECT src, dst, COUNT(*) AS n FROM seq
  WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, CAST(n AS BIGINT) AS n,
       CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS row_total,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src) AS BIGINT)
         AS p_ppm
FROM pairs
ORDER BY src, dst
"""


def robust_group_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    trim_ppm: int = 50_000,
) -> DataFrame:
    """Per-group robust means: plain, trimmed, and winsorized, in one
    shuffle.

    ``trim_ppm`` is the per-side cut: k = floor(n·trim_ppm/1e6) rows
    are dropped from each tail (trimmed) or clamped to the surviving
    boundary order statistics (winsorized) before averaging — the
    standard defenses against the heavy-tailed junk (crawler blowups,
    price glitches, length outliers) that makes a plain mean useless
    as a pipeline health metric.

    Tie-invariance: the cut is by rank over (value), and any k-smallest
    MULTISET of values is identical regardless of how ties order, so
    the trimmed/winsorized sums are deterministic without a tiebreak
    column. All sums are exact 2-decimal decimals (the dsum pattern);
    each mean is one final double division — bit-identical in DuckDB
    (:func:`robust_group_stats_sql`).

    Scale shape: ONE shuffle on the group key; the rank and the
    boundary order statistics ride two window frames over the same
    partitioning (no second exchange). Per-group state is the group's
    rows in one task — for millions-of-rows single groups use the
    quantile sketch (sketches) to cut approximately instead. Groups
    with n ≤ 2k return NULL trimmed/winsorized means (nothing
    survives the cut) rather than a number the cut could not support.

    Returns ``(group_cols…, n, k, mean, trimmed_mean,
    winsorized_mean)`` ordered by the group columns.
    """
    gcols = list(group_cols)
    w_ord = Window.partitionBy(*gcols).orderBy(F.col(value_col))
    w_all = Window.partitionBy(*gcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    v_dec = F.col(value_col).cast(_DEC)
    staged = (
        df.withColumn("__r", F.row_number().over(w_ord))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__k", F.expr(f"(__n * {trim_ppm}) div 1000000"))
        .withColumn(
            "__lo",
            F.max(F.when(F.col("__r") == F.col("__k") + 1, v_dec)).over(
                w_all
            ),
        )
        .withColumn(
            "__hi",
            F.max(
                F.when(F.col("__r") == F.col("__n") - F.col("__k"), v_dec)
            ).over(w_all),
        )
    )
    kept = (F.col("__r") > F.col("__k")) & (
        F.col("__r") <= F.col("__n") - F.col("__k")
    )
    wins_val = (
        F.when(F.col("__r") <= F.col("__k"), F.col("__lo"))
        .when(F.col("__r") > F.col("__n") - F.col("__k"), F.col("__hi"))
        .otherwise(v_dec)
    )
    out = (
        staged.groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__k").cast("long").alias("k"),
            (F.sum(v_dec).cast(_DEC_SUM).cast("double") / F.count(F.lit(1)))
            .alias("mean"),
            F.sum(F.when(kept, v_dec)).cast(_DEC_SUM).alias("__tsum"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("__tn"),
            F.sum(wins_val).cast(_DEC_SUM).alias("__wsum"),
        )
        .select(
            *gcols,
            "n",
            "k",
            "mean",
            F.when(
                F.col("__tn") > 0,
                F.col("__tsum").cast("double") / F.col("__tn"),
            ).alias("trimmed_mean"),
            F.when(
                F.col("__tn") > 0,
                F.col("__wsum").cast("double") / F.col("n"),
            ).alias("winsorized_mean"),
        )
        .orderBy(*gcols)
    )
    return out


def robust_group_stats_sql(
    table: str,
    group_cols: Sequence[str],
    value_col: str,
    trim_ppm: int = 50_000,
) -> str:
    """DuckDB twin of :func:`robust_group_stats` — same rank cut, same
    exact decimal sums, same single double division per mean."""
    g = ", ".join(group_cols)
    v = f"CAST({value_col} AS DECIMAL(18,2))"
    return f"""
WITH staged AS (
  SELECT {g}, {v} AS v,
         ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {value_col}) AS r,
         COUNT(*) OVER (PARTITION BY {g}) AS n
  FROM {table}
),
cut AS (
  SELECT *, (n * {trim_ppm}) // 1000000 AS k FROM staged
),
bounds AS (
  SELECT *,
         MAX(CASE WHEN r = k + 1 THEN v END)
             OVER (PARTITION BY {g}) AS lo,
         MAX(CASE WHEN r = n - k THEN v END)
             OVER (PARTITION BY {g}) AS hi
  FROM cut
)
SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(k) AS BIGINT) AS k,
       CAST(CAST(SUM(v) AS DECIMAL(38,2)) AS DOUBLE) / COUNT(*) AS mean,
       CASE WHEN SUM(CASE WHEN r > k AND r <= n - k THEN 1 ELSE 0 END) > 0
            THEN CAST(CAST(SUM(CASE WHEN r > k AND r <= n - k THEN v END)
                      AS DECIMAL(38,2)) AS DOUBLE)
                 / SUM(CASE WHEN r > k AND r <= n - k THEN 1 ELSE 0 END)
       END AS trimmed_mean,
       CASE WHEN SUM(CASE WHEN r > k AND r <= n - k THEN 1 ELSE 0 END) > 0
            THEN CAST(CAST(SUM(CASE WHEN r <= k THEN lo
                                    WHEN r > n - k THEN hi
                                    ELSE v END) AS DECIMAL(38,2)) AS DOUBLE)
                 / COUNT(*)
       END AS winsorized_mean
FROM bounds
GROUP BY {g}
ORDER BY {g}
"""


def group_normalize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group feature normalization, the two order-preserving maps
    every mixed-source scoring pipeline needs before scores from
    different groups can be compared or mixed: percent-rank (rank
    within group, ties share a rank — Spark's percent_rank semantics
    in exact integer ppm) and min-max position within the group span.

    Values are cast to BIGINT (truncation — identical in both engines
    for the non-negative scores this is for; pre-scale 2-dp doubles by
    100 via the dsum convention if cents matter), so every output is
    an integer floor-division and the DuckDB twin replays bit-for-bit.
    Single-member groups and zero-span groups normalize to 0 (the
    percent_rank convention) rather than NULL — a constant group IS a
    well-defined minimum.

    Scale shape: one shuffle on the group key; rank and min/max ride
    two frames over the same window partitioning.

    Returns ``(group_cols…, id_col, value, pct_rank_ppm, minmax_ppm)``
    ordered by (group, id).
    """
    gcols = list(group_cols)
    w_ord = Window.partitionBy(*gcols).orderBy(F.col("value").asc())
    w_all = Window.partitionBy(*gcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        df.select(
            *gcols,
            F.col(id_col),
            F.col(value_col).cast("long").alias("value"),
        )
        .withColumn("__rk", F.rank().over(w_ord))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__mn", F.min("value").over(w_all))
        .withColumn("__mx", F.max("value").over(w_all))
    )
    return staged.select(
        *gcols,
        id_col,
        "value",
        F.expr(
            "CASE WHEN __n > 1 THEN "
            "div(1000000 * CAST(__rk - 1 AS BIGINT), __n - 1) ELSE 0 END"
        ).alias("pct_rank_ppm"),
        F.expr(
            "CASE WHEN __mx > __mn THEN "
            "div(1000000 * (value - __mn), __mx - __mn) ELSE 0 END"
        ).alias("minmax_ppm"),
    ).orderBy(*gcols, id_col)


def group_normalize_sql(
    table: str,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
) -> str:
    """DuckDB twin of :func:`group_normalize` — same RANK tie
    semantics, same integer ppm floors, same 0-not-NULL degenerate
    convention. FLOOR before the BIGINT cast because DuckDB's cast
    ROUNDS where Spark's truncates — identical for the non-negative
    scores this operator is documented for."""
    g = ", ".join(group_cols)
    return f"""
WITH staged AS (
  SELECT {g}, {id_col},
         CAST(FLOOR({value_col}) AS BIGINT) AS value,
         RANK() OVER (PARTITION BY {g}
                      ORDER BY CAST(FLOOR({value_col}) AS BIGINT) ASC)
             AS rk,
         COUNT(*) OVER (PARTITION BY {g}) AS n,
         MIN(CAST(FLOOR({value_col}) AS BIGINT))
             OVER (PARTITION BY {g}) AS mn,
         MAX(CAST(FLOOR({value_col}) AS BIGINT))
             OVER (PARTITION BY {g}) AS mx
  FROM {table}
)
SELECT {g}, {id_col}, value,
       CAST(CASE WHEN n > 1 THEN 1000000 * (rk - 1) // (n - 1)
                 ELSE 0 END AS BIGINT) AS pct_rank_ppm,
       CAST(CASE WHEN mx > mn THEN 1000000 * (value - mn) // (mx - mn)
                 ELSE 0 END AS BIGINT) AS minmax_ppm
FROM staged
ORDER BY {g}, {id_col}
"""
