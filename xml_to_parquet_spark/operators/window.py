"""Window operators (SURVEY.md §2.5).

Reference parity:
- surrogate_keys   R/star_transformer.R:56-61 (W1): sort distinct dimension
  values ascending, assign row_number() as the surrogate key.

Scale note: a global Window.orderBy is a single-partition sort. That is the
*correct* physical plan here because the star transformer only builds
dimensions for cardinality-capped columns (<50 distinct values by the
classifier rule, R/schema_analyzer.R:34) — the sorted input is tiny no matter
how big the fact table is. For an uncapped column use
``surrogate_keys_scalable`` (hash-based, no global sort, keys stable but not
dense).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surrogate_keys(
    df: DataFrame, value_col: str, key_col: str | None = None
) -> DataFrame:
    """Distinct values of ``value_col`` → dense 1-based keys ordered by value.

    Returns a two-column DataFrame ``(key_col, value_col)``. Global and
    deterministic — fixes the reference's per-batch key inconsistency
    (SURVEY §2.12 quirk 1; the intended semantics per README.md:184-196).
    """
    key_col = key_col or f"{value_col}_key"
    distinct = df.select(value_col).filter(F.col(value_col).isNotNull()).distinct()
    w = Window.orderBy(F.col(value_col).asc())
    return distinct.select(
        F.row_number().over(w).alias(key_col), F.col(value_col)
    )


def surrogate_keys_scalable(
    df: DataFrame, value_col: str, key_col: str | None = None
) -> DataFrame:
    """Hash-based surrogate keys for high-cardinality columns.

    xxhash64 of the value: deterministic, collision-unlikely (64-bit), and
    computed with zero global sort — each partition keys its own values.
    Keys are stable across runs but not dense/ordinal.
    """
    key_col = key_col or f"{value_col}_key"
    distinct = df.select(value_col).filter(F.col(value_col).isNotNull()).distinct()
    return distinct.select(
        F.xxhash64(F.col(value_col)).alias(key_col), F.col(value_col)
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group via rank-filtered window.

    The rank<=k filter sits directly on the row_number so Spark's
    WindowGroupLimit pushes a per-partition top-k below the shuffle —
    each map task keeps only k rows per group before exchanging, so the
    shuffle volume is k·|groups| regardless of input size. That is the
    property that makes window top-k survive 100 TB; verify with
    .explain() (look for WindowGroupLimit above the Exchange).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def rate_limit_flags(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    limit: int,
    window_s: int,
) -> DataFrame:
    """Sliding-log rate limiting as a batch window: flag every event
    whose key has had MORE than ``limit`` events in the trailing
    ``window_s`` seconds (inclusive of the current second) — the
    offline replay of an API/abuse throttle, and the audit tool for
    choosing its parameters before deploying one.

    Semantics are SECOND-granular and tie-deterministic by
    construction: the count runs over a RANGE frame on epoch seconds,
    so all events sharing a timestamp are peers and receive the SAME
    verdict — no dependence on intra-second ordering (a ROWS frame
    would silently order ties arbitrarily and break replay). The flag
    means "at this event's second, the key exceeded limit within the
    window", matching a sliding-log limiter that admits or rejects
    whole seconds.

    Scale shape: one shuffle on the key; the range frame is a single
    pass over each key's timeline (Spark keeps a sliding frame, not
    per-row rescans). Per-key state is that key's rows in one task —
    the same hot-key caveat as every per-key timeline op here (salt or
    pre-aggregate to (key, second) counts first for abusive keys,
    which preserves these exact semantics).

    Returns the input columns plus ``win_count`` and ``throttled``.
    """
    if limit < 1 or window_s < 1:
        raise ValueError(f"need limit>=1, window_s>=1: {limit}/{window_s}")
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(sec)
        .rangeBetween(-(window_s - 1), 0)
    )
    return df.withColumn(
        "win_count", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn("throttled", F.col("win_count") > limit)
