"""Deterministic, reproducible sampling for training-data pipelines.

The reference has no sampling surface at all (its only "sample" is head-100
files for schema inference, main.R:95); at 100 TB, *reproducible* sampling is
a first-class operator: re-running the pipeline must select the same rows, on
any cluster, at any partitioning — which rules out `df.sample()` (seeded
per-partition, so the selection changes when partitioning changes).

The primitive here is **hash-gate sampling**: keep a row iff the first
`HEX_DIGITS` hex chars of `md5(key || ':' || salt)` fall below a threshold
derived from the rate. Because lowercase fixed-width hex compares
lexicographically exactly as it compares numerically, the gate is a plain
string comparison — no bigint conversion — and is bit-identical in every
engine that has md5 (Spark, DuckDB, Python). Changing the salt draws an
independent sample; the rate error is < 16^-HEX_DIGITS.

Scale notes: the gate is a deterministic per-row filter — no shuffle, no
state, pushes down past column pruning, and composes with partition pruning.
Stratified rates become one CASE ladder over the stratum column (still a
single scan, no per-stratum jobs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = 6  # rate resolution 16^-6 ≈ 6e-8


def hex_threshold(rate: float, digits: int = HEX_DIGITS) -> str:
    """Lowercase hex gate for ``rate`` ∈ [0, 1], zero-padded to ``digits``.

    rate=1.0 must keep EVERY row, but 16^digits is a digits+1-char string
    ("1000000") that sorts *below* most fixed-width hex keys — so saturated
    rates return 'g'*digits instead: 'g' > 'f' beats every hex string while
    keeping the gate a plain string comparison.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    n = int(rate * (16**digits))
    if n >= 16**digits:
        return "g" * digits
    return format(n, "x").zfill(digits)


def sample_key(key: Column, salt: str, digits: int = HEX_DIGITS) -> Column:
    """The comparable hash prefix for a row key (lowercase hex string)."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, digits
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "s0"
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed on ``key_col``.

    Same (key, salt) → same decision forever, regardless of partitioning,
    cluster size, or engine. Replaces reference-style ``head(n)`` sampling
    (main.R:95) with something that holds at 100 TB.
    """
    gate = sample_key(F.col(key_col), salt) < F.lit(hex_threshold(rate))
    return df.filter(gate)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling in ONE scan (no per-stratum jobs).

    ``rates`` maps stratum value → keep fraction; unlisted strata use
    ``default_rate``. The per-row threshold is a CASE ladder, so the whole
    thing stays a single pushed-down filter.
    """
    thr: Column = F.lit(hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(sample_key(F.col(key_col), salt) < thr)


def hash_sample_sql(
    key_expr: str, rate: float, salt: str = "s0", digits: int = HEX_DIGITS
) -> str:
    """DuckDB/ANSI predicate equivalent to :func:`hash_sample`'s gate."""
    thr = hex_threshold(rate, digits)
    return (
        f"substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'), 1, {digits})"
        f" < '{thr}'"
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split0",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column.

    ``fractions`` maps split name → fraction (must sum to 1); cut points
    are cumulative hex thresholds over the same md5 gate as
    :func:`hash_sample`, so the assignment is exhaustive, disjoint,
    partitioning-invariant, and identical in every engine — a document
    never migrates between splits when the cluster or file layout changes
    (the property that prevents test-set leakage across pipeline re-runs).
    Split order for the cut points is dict insertion order.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = sample_key(F.col(key_col), salt)
    names = list(fractions)
    cum = 0.0
    expr: Column = F.lit(names[-1])  # last split takes the remainder
    conds = []
    for name in names[:-1]:
        cum += fractions[name]
        conds.append((name, hex_threshold(cum)))
    for name, thr in reversed(conds):
        expr = F.when(key < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def assign_split_sql(
    key_expr: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split0",
    digits: int = HEX_DIGITS,
) -> str:
    """ANSI CASE expression equivalent to :func:`assign_split`."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    key = f"substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'), 1, {digits})"
    names = list(fractions)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += fractions[name]
        whens.append(f"WHEN {key} < '{hex_threshold(cum, digits)}' THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def weighted_mixture(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    shuffle_salt: str = "epoch0",
) -> DataFrame:
    """Compose a training mixture: per-source deterministic sampling rates +
    provenance label + a deterministic global shuffle key.

    ``sources`` maps label → (df, rate). The output carries ``mix_source``
    and ``shuffle_key``; consumers ORDER BY shuffle_key for a reproducible
    epoch order (a new salt = a new epoch permutation). No shuffle happens
    here — the order is declared by the key, materialized only where needed
    (e.g., the final write's sortWithinPartitions).
    """
    parts = []
    for label, (df, rate) in sorted(sources.items()):
        part = hash_sample(df, key_col, rate, salt="mix:" + label)
        parts.append(
            part.withColumn("mix_source", F.lit(label)).withColumn(
                "shuffle_key",
                sample_key(
                    F.concat(F.col(key_col).cast("string"), F.lit("@" + label)),
                    shuffle_salt,
                    digits=8,
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


PRIORITY_SCALE = float(2**52)  # u+1 ∈ [1, 2^52] ⇒ u01 = (u+1)/2^52 ∈ (0,1]


def priority_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    k: int = 64,
    salt: str = "ps",
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 2007): a k-row
    weighted sample WITHOUT replacement with per-row unbiased
    subset-sum estimators — the weighted counterpart of
    :func:`hash_sample` for "keep the k most important docs but stay
    able to estimate any group's total weight from the sample alone".

    Priority ``q_i = w_i / u_i`` with ``u_i ∈ (0,1]`` drawn from the
    row key (md5, same determinism contract as the hash gate: any
    cluster, any partitioning, same sample). Keep the k largest
    priorities; with ``τ`` = the (k+1)-th largest, each kept row's
    estimator is ``max(w_i, τ)`` — unbiased for every subset sum, with
    near-optimal variance among all k-row sketches (the DLT result).
    Rows with ``w ≤ 0`` can never be sampled and are dropped up front.

    Cross-engine exactness: ``u+1 ≤ 2^52`` and ``w`` are both exact in
    a double, ``w × 2^52`` only shifts the exponent, and IEEE-754
    division is correctly rounded in both the JVM and DuckDB — so the
    priorities, the order, τ, and ``floor(max(w, τ))`` are
    bit-identical in SQL (the oracle replays the whole draw).

    Scale shape: ``ORDER BY q DESC LIMIT k+1`` compiles to
    TakeOrderedAndProject — per-partition top-(k+1) heaps, one tiny
    final merge; no full sort, no shuffle of the corpus. The window
    that ranks the survivors runs over ≤ k+1 rows.

    Returns ``(key, weight, est_weight, rk)`` ordered by rank, where
    ``est_weight = floor(max(w, τ))`` (τ = 0 when the corpus has ≤ k
    positive-weight rows — the sample is then exhaustive and exact).
    """
    from pyspark.sql import Window

    from xml_to_parquet_spark.functions.sketches import md5_hash52

    u = md5_hash52(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    )
    q = (F.col(weight_col).cast("double") * F.lit(PRIORITY_SCALE)) / (
        u + F.lit(1)
    ).cast("double")
    topk1 = (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(key_col).alias("key"),
            F.col(weight_col).cast("long").alias("weight"),
            q.alias("q"),
        )
        .orderBy(F.desc("q"), "key")
        .limit(k + 1)
    )
    # ≤ k+1 rows from here on: the single-partition window is the point
    # (partitionBy a constant so WindowExec doesn't warn about it)
    w_all = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.desc("q"), "key")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = topk1.select(
        "key",
        "weight",
        F.row_number()
        .over(Window.partitionBy(F.lit(0)).orderBy(F.desc("q"), "key"))
        .alias("rk"),
        F.when(F.count(F.lit(1)).over(w_all) > k, F.min("q").over(w_all))
        .otherwise(F.lit(0.0))
        .alias("tau"),
    )
    return (
        ranked.filter(F.col("rk") <= k)
        .select(
            "key",
            "weight",
            F.floor(F.greatest(F.col("weight").cast("double"), F.col("tau")))
            .cast("long")
            .alias("est_weight"),
            "rk",
        )
        .orderBy("rk")
    )


def grouped_priority_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_col: str = "doc_id",
    k: int = 16,
    salt: str = "ps",
) -> DataFrame:
    """Per-group :func:`priority_sample`: an independent k-row DLT
    draw per stratum (e.g. per language/source), each with its own
    threshold τ_g and unbiased subset-sum estimators — the stratified
    corpus-stats shape ("hold k docs per source, still estimate any
    per-source total"). Same md5 priorities as the global sampler
    (the group does NOT enter the hash, so a row's priority — and u —
    is stable even if rows later regroup); only the top-k cutoff and
    τ become per-group.

    Scale shape: ONE window over the group key (a single shuffle by
    group, rank + per-group count/min in the same window pass) — no
    per-group jobs, no driver loop. Exactness contract identical to
    the global sampler, so the SQL oracle replays every draw.

    Returns ``(group, key, weight, est_weight, rk)`` ordered."""
    from pyspark.sql import Window

    from xml_to_parquet_spark.functions.sketches import md5_hash52

    u = md5_hash52(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    )
    q = (F.col(weight_col).cast("double") * F.lit(PRIORITY_SCALE)) / (
        u + F.lit(1)
    ).cast("double")
    scored = df.filter(F.col(weight_col) > 0).select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        q.alias("q"),
    )
    w_rank = Window.partitionBy("grp").orderBy(F.desc("q"), "key")
    w_all = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = scored.select(
        "grp",
        "key",
        "weight",
        F.row_number().over(w_rank).alias("rk"),
        # τ_g = the (k+1)-th priority of the group, 0 if exhaustive.
        # min(q) over the k+1-row frame IS that priority once rows
        # beyond k+1 are discarded, so filter first on rank ≤ k+1.
        F.col("q"),
        F.count(F.lit(1)).over(w_all).alias("n_g"),
    ).filter(F.col("rk") <= k + 1)
    w_g = Window.partitionBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tau = ranked.select(
        "grp",
        "key",
        "weight",
        "rk",
        F.when(F.col("n_g") > k, F.min("q").over(w_g))
        .otherwise(F.lit(0.0))
        .alias("tau"),
    )
    return (
        with_tau.filter(F.col("rk") <= k)
        .select(
            F.col("grp").alias(group_col),
            "key",
            "weight",
            F.floor(F.greatest(F.col("weight").cast("double"), F.col("tau")))
            .cast("long")
            .alias("est_weight"),
            "rk",
        )
        .orderBy(group_col, "rk")
    )


def grouped_priority_sample_sql(
    table: str,
    group_col: str,
    weight_expr: str,
    key_col: str = "doc_id",
    k: int = 16,
    salt: str = "ps",
) -> str:
    """DuckDB replay of :func:`grouped_priority_sample`."""
    u = f"CAST('0x'||substr(md5(CAST({key_col} AS VARCHAR) || ':{salt}'),1,13) AS BIGINT)"
    return f"""
WITH scored AS (
  SELECT {group_col} AS grp, {key_col} AS key,
         CAST({weight_expr} AS BIGINT) AS weight,
         (CAST({weight_expr} AS DOUBLE) * {PRIORITY_SCALE!r}) /
           CAST({u} + 1 AS DOUBLE) AS q
  FROM {table} WHERE {weight_expr} > 0),
ranked AS (
  SELECT grp, key, weight, q,
         row_number() OVER (PARTITION BY grp ORDER BY q DESC, key) AS rk,
         count(*) OVER (PARTITION BY grp) AS n_g
  FROM scored),
kept AS (SELECT * FROM ranked WHERE rk <= {k + 1}),
with_tau AS (
  SELECT grp, key, weight, rk,
         CASE WHEN n_g > {k}
              THEN min(q) OVER (PARTITION BY grp) ELSE 0.0 END AS tau
  FROM kept)
SELECT grp AS {group_col}, key, weight,
       CAST(floor(greatest(CAST(weight AS DOUBLE), tau)) AS BIGINT)
         AS est_weight,
       CAST(rk AS INT) AS rk
FROM with_tau WHERE rk <= {k} ORDER BY {group_col}, rk
"""


def priority_sample_sql(
    table: str,
    weight_expr: str,
    key_col: str = "doc_id",
    k: int = 64,
    salt: str = "ps",
) -> str:
    """DuckDB replay of :func:`priority_sample` — same md5 bits, same
    IEEE double arithmetic, same tie-break, so the draw is identical."""
    u = f"CAST('0x'||substr(md5(CAST({key_col} AS VARCHAR) || ':{salt}'),1,13) AS BIGINT)"
    return f"""
WITH scored AS (
  SELECT {key_col} AS key, CAST({weight_expr} AS BIGINT) AS weight,
         (CAST({weight_expr} AS DOUBLE) * {PRIORITY_SCALE!r}) /
           CAST({u} + 1 AS DOUBLE) AS q
  FROM {table} WHERE {weight_expr} > 0),
top AS (SELECT * FROM scored ORDER BY q DESC, key LIMIT {k + 1}),
ranked AS (
  SELECT key, weight, q,
         row_number() OVER (ORDER BY q DESC, key) AS rk,
         CASE WHEN (SELECT count(*) FROM top) > {k}
              THEN (SELECT min(q) FROM top) ELSE 0.0 END AS tau
  FROM top)
SELECT key, weight,
       CAST(floor(greatest(CAST(weight AS DOUBLE), tau)) AS BIGINT)
         AS est_weight,
       CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {k} ORDER BY rk
"""


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence-packing planner: where does each document
    land when the (deterministically ordered) token stream is concatenated
    and cut into fixed-``budget`` training chunks?

    Per doc: start_offset (exclusive prefix sum of tokens in id order),
    start_chunk / end_chunk (chunk index of first/last token), n_chunks
    spanned. This is the packing LLM pretraining uses (concatenate, then
    slice at sequence-length boundaries) — the planner is pure integer
    window math, so any engine reproduces it exactly.

    Scale: with ``shard_col`` the window partitions by shard and the plan is
    fully parallel (each shard is an independent token stream — matching how
    distributed loaders shard anyway). Without it the window is global: one
    ordered exchange — fine for planning metadata, not for 100 TB row
    streams; always pass a shard at scale.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col) if shard_col else Window.partitionBy()
    ).orderBy(id_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = F.col(token_col).cast("long")
    cum = F.sum(t).over(w)
    start = (cum - t).alias("start_offset")
    out_cols = [F.col(id_col), t.alias("n_tokens"), start]
    if shard_col:
        out_cols.insert(0, F.col(shard_col))
    # integer `div`, never float division: a 100 TB stream's prefix sums
    # exceed 2^53, where double division starts rounding chunk boundaries
    return (
        df.select(*out_cols)
        .withColumn("start_chunk", F.expr(f"start_offset div {budget}"))
        .withColumn(
            "end_chunk",
            F.expr(f"(start_offset + n_tokens - 1) div {budget}"),
        )
        .withColumn(
            "n_chunks", (F.col("end_chunk") - F.col("start_chunk") + 1)
        )
    )


PACK_NOSPLIT_SCHEMA = (
    "shard long, doc_id long, n_tokens long, bin_id int, bin_fill long"
)


def pack_sequences_nosplit(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_size: int = 64,
) -> DataFrame:
    """NO-SPLIT sequence packing (r10) — the SFT/finetuning discipline
    (:func:`pack_sequences` is the pretraining concat-and-chunk twin):
    documents are never cut; within each shard they are taken in
    next-fit-decreasing order (n_tokens DESC, id ASC) and appended to
    the current bin until it would overflow ``budget``, which opens a
    new bin. A document longer than the budget gets a bin of its own
    (bin_fill > budget flags it — callers drop or truncate upstream).

    Packing with a running reset-on-overflow state is inherently
    SEQUENTIAL — not a window function — so this is the documented
    Pandas-UDF escape hatch: ``applyInPandas`` per shard (shard =
    ``id DIV shard_size``), shards packing in parallel with bounded
    memory (≤ shard_size rows each), no carry across shards — exactly
    how distributed loaders shard packing anyway. The whole plan is one
    shuffle on the shard key. Deterministic, so the DuckDB oracle
    replays it with a recursive CTE advancing every shard in lockstep.

    Returns (shard, doc_id, n_tokens, bin_id, bin_fill) where bin_fill
    is the bin's cumulative fill after placing the doc.
    """
    if budget < 1:
        raise ValueError(f"pack_sequences_nosplit: budget must be >= 1, got {budget}")
    if shard_size < 1:
        raise ValueError(
            f"pack_sequences_nosplit: shard_size must be >= 1, got {shard_size}"
        )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bin_ids, fills = [], []
        bid, fill = -1, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if bid < 0 or fill + t > budget:
                bid += 1
                fill = t
            else:
                fill += t
            bin_ids.append(bid)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int32")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf[["shard", "doc_id", "n_tokens", "bin_id", "bin_fill"]]

    from xml_to_parquet_spark.session import _ship_package

    _ship_package(df.sparkSession)
    base = df.select(
        F.expr(f"{id_col} DIV {shard_size}").alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    return base.groupBy("shard").applyInPandas(_pack, PACK_NOSPLIT_SCHEMA)


def pack_nosplit_sql(
    budget: int,
    table: str = "documents",
    token_expr: str = "n_chars",
    id_col: str = "doc_id",
    shard_size: int = 64,
    order: bool = True,
) -> str:
    """Oracle twin of :func:`pack_sequences_nosplit`: a recursive CTE
    walks each shard's rank order one row per iteration (every shard
    advances in lockstep), carrying the (bin_id, bin_fill) state —
    the exact sequential semantics, no approximation."""
    tail = f"ORDER BY shard, bin_id, {id_col}" if order else ""
    return f"""
WITH RECURSIVE d AS (
  SELECT {id_col} AS doc_id, CAST({token_expr} AS BIGINT) AS n_tokens,
         {id_col} // {shard_size} AS shard,
         row_number() OVER (PARTITION BY {id_col} // {shard_size}
                            ORDER BY {token_expr} DESC, {id_col} ASC) AS rk
  FROM {table}
),
pack AS (
  SELECT shard, rk, doc_id, n_tokens,
         0 AS bin_id, n_tokens AS bin_fill
  FROM d WHERE rk = 1
  UNION ALL
  SELECT d.shard, d.rk, d.doc_id, d.n_tokens,
         CASE WHEN p.bin_fill + d.n_tokens > {budget}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.bin_fill + d.n_tokens > {budget}
              THEN d.n_tokens ELSE p.bin_fill + d.n_tokens END
  FROM pack p JOIN d ON d.shard = p.shard AND d.rk = p.rk + 1
)
SELECT CAST(shard AS BIGINT) AS shard, doc_id, n_tokens,
       CAST(bin_id AS INT) AS bin_id, CAST(bin_fill AS BIGINT) AS bin_fill
FROM pack {tail}
"""


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split0",
    iterations: int = 3,
) -> DataFrame:
    """Cluster-aware train/val/test split: near-duplicates never straddle
    a split boundary.

    :func:`assign_split` keyed on the document id leaks — two
    near-identical documents hash independently, so one lands in train
    and its twin in test, and the eval set ends up scoring memorization.
    The fix is to key the SAME deterministic hash gate on the near-dup
    *cluster* id instead: connected components over the candidate pair
    list (dedup.dedup_clusters), every document labeled by its component
    (documents in no pair keep their own id), split assigned per label —
    so an entire duplicate cluster moves between splits as one unit.

    Scale shape: the clustering cost is iterations × |edges| joins over
    the near-dup SUBGRAPH (pairs, not corpus); the label table is bounded
    by the paired-node count — usually a small corpus fraction, so the
    attach join is left unhinted for AQE to broadcast when it fits (it is
    SF-dependent, so no static broadcast hint per the SCALING.md policy);
    the split itself stays one row-local deterministic expression.
    Output: (id, cluster_id, split) — exhaustive, disjoint,
    partitioning- and engine-invariant like assign_split.
    """
    from xml_to_parquet_spark.functions.dedup import dedup_clusters

    clusters = dedup_clusters(pairs, iterations=iterations)
    labeled = (
        docs.select(F.col(id_col))
        .join(clusters, on=id_col, how="left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
        )
    )
    return assign_split(
        labeled, key_col="cluster_id", fractions=fractions, salt=salt
    )


def dsir_scores(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
    weight_sample_rate: float = 1.0,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, public): rank raw
    documents by how target-like their hashed-n-gram profile is.

    Integer re-expression of the published recipe so the result is
    partitioning-invariant and exactly oracle-replayable: tokens hash
    into ``n_buckets`` buckets; each bucket's weight is the Laplace-
    smoothed target/raw frequency ratio in fixed-point,
    ``w[b] = ((tgt_cnt+1)*scale) // (raw_cnt+1)``; a document's score
    is the sum of its tokens' bucket weights (with multiplicity) —
    the log-likelihood-ratio shape with ratios in place of logs, which
    preserves the *ranking* the published estimator induces for the
    smoothed two-distribution case while staying in BIGINT.

    Scale shape: the bucket table is ≤ n_buckets rows whatever the
    corpus (built by one map-side-combined groupBy over the token
    stream) and is broadcast into the per-token join; the only
    corpus-sized shuffle is the per-doc score groupBy. Overflow bound:
    score ≤ n_tokens(doc) · scale · (|target|+1) — far under 2^63 for
    any real scale/corpus pairing (documented contract).

    ``weight_sample_rate`` is the 100 TB knob (and the published
    method's own shape — DSIR fits its importance model on a sample):
    with rate < 1 the weight table is estimated from a deterministic
    md5-gate document sample (same hash gate as :func:`hash_sample`,
    so the sample — and therefore the weights and the ranking — is
    partitioning/engine-invariant and still exactly SQL-replayable),
    cutting the weights pass from a full corpus scan to a sampled one;
    scoring always reads every document once. Default 1.0 keeps the
    exact-full-corpus weights the catalog oracle replays.
    """
    from xml_to_parquet_spark.functions.sketches import md5_hash52
    from xml_to_parquet_spark.functions.text import norm_text

    toks = docs.select(
        F.col(id_col),
        target_pred.cast("int").alias("is_tgt"),
        F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("token"),
    ).withColumn("bucket", md5_hash52(F.col("token")) % n_buckets)
    weight_src = (
        toks
        if weight_sample_rate >= 1.0
        else toks.filter(
            sample_key(F.col(id_col), "dsirw")
            < F.lit(hex_threshold(weight_sample_rate))
        )
    )
    buckets = weight_src.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum("is_tgt").alias("tgt_cnt"),
    )
    w = F.expr(f"div((tgt_cnt + 1) * {scale}L, raw_cnt + 1)").alias("w")
    weights = buckets.select("bucket", w)
    # Left join + Laplace-neutral fallback: with weight_sample_rate < 1 a
    # bucket may never appear in the sampled weight table; its tokens must
    # score the smoothed empty-bucket weight ((0+1)*scale)//(0+1) == scale,
    # not vanish (an inner join would silently drop them — and drop any
    # document whose every token lands in unseen buckets).
    return (
        toks.join(F.broadcast(weights), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("w"), F.lit(scale))).alias("dsir_score")
        )
    )


def dsir_scores_sql(
    table: str,
    target_pred_sql: str,
    norm_sql: str,
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
) -> str:
    """Oracle twin of :func:`dsir_scores` over a DuckDB view."""
    h = f"CAST('0x'||substr(md5(token),1,13) AS BIGINT) % {n_buckets}"
    return f"""
WITH toks AS (
  SELECT {id_col}, CAST(__tp AS INTEGER) AS is_tgt,
         {h} AS bucket
  FROM (SELECT {id_col}, {target_pred_sql} AS __tp,
               unnest(string_split({norm_sql}, ' ')) AS token
        FROM {table}) t
),
buckets AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS raw_cnt,
         CAST(SUM(is_tgt) AS BIGINT) AS tgt_cnt
  FROM toks GROUP BY bucket
),
weights AS (
  SELECT bucket, (tgt_cnt + 1) * {scale} // (raw_cnt + 1) AS w
  FROM buckets
)
SELECT {id_col}, CAST(SUM(w) AS BIGINT) AS dsir_score
FROM toks JOIN weights USING (bucket)
GROUP BY {id_col}
"""


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """k-anonymity suppression over quasi-identifier columns — the
    privacy-curation step between PII scrubbing (text.scrub_pii redacts
    direct identifiers) and release: a row whose quasi-identifier
    combination is shared by fewer than ``k`` rows is re-identifiable by
    linkage, so its quasi values are suppressed to NULL (Sweeney 2002,
    the published k-anonymity model; suppression-only variant — no
    generalization hierarchies).

    Returns the input's id plus each quasi column (suppressed where the
    equivalence class is small), the class size ``grp_n``, and the
    ``suppressed`` flag. Every row survives — suppression redacts, it
    does not drop — so downstream joins keep their cardinality.

    Shape: one map-side-combined groupBy builds the equivalence-class
    table (shuffle ∝ distinct quasi combinations, not rows), then one
    equi-join back on the quasi key. NULL quasi values group together
    (SQL GROUP BY semantics) and the join uses null-safe equality so
    NULL-keyed rows still pick up their class size. At 100 TB the class
    table is dimension-sized for realistic quasi sets; AQE broadcasts it
    when it fits."""
    # class-table columns are renamed before the join so the plan is not
    # an ambiguous self-reference (the class table derives from df)
    grp = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("grp_n"))
        .select(
            *[F.col(c).alias(f"_q_{c}") for c in quasi_cols], "grp_n"
        )
    )
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_q_{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = df.join(grp, on=cond, how="left")
    keep = F.col("grp_n") >= k
    return joined.select(
        F.col(id_col),
        *[
            F.when(keep, F.col(c)).otherwise(F.lit(None)).alias(c)
            for c in quasi_cols
        ],
        F.col("grp_n"),
        (~keep).cast("int").alias("suppressed"),
    )


def k_anonymize_sql(
    table: str,
    quasi_cols: list[str],
    k: int = 5,
    id_col: str = "doc_id",
) -> str:
    """Oracle twin of :func:`k_anonymize` — same class table, same
    null-safe join, same suppression."""
    quasi = ", ".join(quasi_cols)
    on = " AND ".join(
        f"t.{c} IS NOT DISTINCT FROM g.{c}" for c in quasi_cols
    )
    sup = ",\n       ".join(
        f"CASE WHEN g.grp_n >= {k} THEN t.{c} ELSE NULL END AS {c}"
        for c in quasi_cols
    )
    return f"""
WITH g AS (
  SELECT {quasi}, COUNT(*) AS grp_n FROM {table} GROUP BY {quasi}
)
SELECT t.{id_col},
       {sup},
       CAST(g.grp_n AS BIGINT) AS grp_n,
       CAST(g.grp_n < {k} AS INTEGER) AS suppressed
FROM {table} t LEFT JOIN g ON {on}
ORDER BY t.{id_col}
"""


# Poisson(1) CDF thresholds in the 52-bit md5 hash space:
# T_k = floor(2^52 * P(X <= k)), X ~ Poisson(1), k = 0..8. A uniform
# 52-bit hash h draws the bootstrap weight w = #{k : h >= T_k} (inverse
# CDF; capped at 9 — P(X > 8) ~ 1.1e-7, one row in ten million loses a
# vanishing tail weight). Integer constants, so any engine replays the
# identical draw.
POISSON1_T52: tuple[int, ...] = (
    1656781714176974,
    3313563428353948,
    4141954285442435,
    4418084571138597,
    4487117142562638,
    4500923656847446,
    4503224742561580,
    4503553469092171,
    4503594559908495,
)


def poisson_bootstrap_means(
    df: DataFrame,
    value_col: str,
    key_col: str,
    replicates: int = 16,
    salt: str = "boot",
) -> DataFrame:
    """One-pass Poisson bootstrap of the mean (Chamandy et al. 2012,
    "Estimating Uncertainty for Massive Data Streams" — the published
    way to bootstrap at cluster scale): instead of resampling n rows B
    times (impossible at 100 TB), each row independently draws a
    Poisson(1) weight per replicate — the large-n limit of the
    multinomial bootstrap — so ALL B replicate estimates come from ONE
    corpus pass.

    Deterministic integer rendition: the weight for (row, replicate r)
    is the Poisson(1) inverse CDF evaluated at ``md5_hash52(key:salt:r)``
    against precomputed integer thresholds (:data:`POISSON1_T52`);
    weighted sums run in exact DECIMAL. No row explosion: the B
    replicates are B agg columns (map-side combined — the shuffle
    carries B partials per partition, not B× rows).

    Returns ``(replicate, n_eff, est_mean)`` for r = 0..B-1 plus row
    ``replicate = -1`` with the plain point estimate — feed the spread
    of ``est_mean`` to whatever CI rule you use (the replicate table IS
    the bootstrap distribution)."""
    from xml_to_parquet_spark.functions.sketches import md5_hash52

    # a NULL measure contributes neither weight nor mass (otherwise it
    # would inflate n_eff but not the sum and bias every replicate)
    df = df.filter(F.col(value_col).isNotNull())

    def w(r: int):
        h = md5_hash52(
            F.concat_ws(":", F.col(key_col).cast("string"),
                        F.lit(salt), F.lit(str(r)))
        )
        x = None
        for t in POISSON1_T52:
            ind = (h >= F.lit(t)).cast("long")
            x = ind if x is None else (x + ind)
        return x

    dec = F.col(value_col).cast("decimal(18,2)")
    aggs = [
        F.count(F.lit(1)).alias("n_0"),
        F.sum(dec).cast("decimal(38,2)").alias("s_0"),
    ]
    for r in range(replicates):
        wr = w(r)
        aggs.append(F.sum(wr).alias(f"n_{r + 1}"))
        aggs.append(
            F.sum(wr.cast("decimal(18,2)") * dec)
            .cast("decimal(38,2)")
            .alias(f"s_{r + 1}")
        )
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"named_struct('r', {r - 1}L, 'n', n_{r}, 's', s_{r})"
        for r in range(replicates + 1)
    )
    return (
        wide.select(F.explode(F.expr(f"array({pairs})")).alias("rep"))
        .select(
            F.col("rep.r").alias("replicate"),
            F.col("rep.n").cast("long").alias("n_eff"),
            # nullif guard: a zero-total-weight replicate (tiny corpora
            # only) must be NULL in BOTH engines — DuckDB's default
            # ieee_floating_point_ops would otherwise render x/0 as inf
            (F.col("rep.s").cast("double")
             / F.expr("nullif(rep.n, 0)"))
            .alias("est_mean"),
        )
        .orderBy("replicate")
    )


def poisson_bootstrap_means_sql(
    table: str,
    value_col: str,
    key_col: str,
    replicates: int = 16,
    salt: str = "boot",
) -> str:
    """Oracle twin of :func:`poisson_bootstrap_means` — same hash draw,
    same thresholds, same decimal sums, same final division."""
    def w(r: int) -> str:
        h = (
            f"CAST('0x' || substr(md5({key_col} || ':{salt}:{r}'), 1, 13) "
            "AS BIGINT)"
        )
        return " + ".join(
            f"CAST({h} >= {t} AS BIGINT)" for t in POISSON1_T52
        )

    cols = [
        "CAST(COUNT(*) AS BIGINT) AS n_0",
        f"CAST(SUM(CAST({value_col} AS DECIMAL(18,2))) AS DECIMAL(38,2))"
        " AS s_0",
    ]
    for r in range(replicates):
        cols.append(f"CAST(SUM({w(r)}) AS BIGINT) AS n_{r + 1}")
        cols.append(
            f"CAST(SUM(CAST(({w(r)}) AS DECIMAL(18,2)) * "
            f"CAST({value_col} AS DECIMAL(18,2))) AS DECIMAL(38,2)) "
            f"AS s_{r + 1}"
        )
    sel = ",\n  ".join(cols)
    rows = ",\n  ".join(
        f"({r - 1}, n_{r}, s_{r})" for r in range(replicates + 1)
    )
    return f"""
WITH wide AS (SELECT {sel} FROM {table} WHERE {value_col} IS NOT NULL),
reps(replicate, n_eff, s) AS (
  SELECT u.* FROM wide, (VALUES {rows}) u
)
SELECT CAST(replicate AS BIGINT) AS replicate,
       CAST(n_eff AS BIGINT) AS n_eff,
       CAST(s AS DOUBLE) / NULLIF(n_eff, 0) AS est_mean
FROM reps ORDER BY replicate
"""


def percentile_rank_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-slice percentile-rank normalization of a quality score — the
    calibration step before a GLOBAL threshold: raw scores are not
    comparable across sources (a boilerplate-heavy domain's median
    length differs 10× from a forum's), so each document gets its rank
    within its OWN slice as integer ppm, ``pr_ppm = (rank-1)*1e6 //
    (n-1)`` (0 for the slice minimum, 1e6 for the maximum, ties broken
    by id for determinism; single-row slices get 0 — no evidence).
    Thresholding pr_ppm then drops the same FRACTION from every source
    instead of whole low-scoring domains.

    Shape: one rank window + one count window, both partitioned by the
    slice — per-partition work ∝ slice size (the documented window-skew
    caveat applies to mega-slices; the bounded-memory alternative at
    100 TB is the quantile sketch (sketches.histogram_quantiles) mapped
    through a broadcast CDF table, trading exact ranks for ≤4.4% rank
    error). Returns input id/group/score plus ``pr_ppm``."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(score_col),
            F.expr(
                "div((rank - 1) * 1000000L, greatest(n - 1, 1L))"
            ).cast("long").alias("pr_ppm"),
        )
    )


def percentile_rank_normalize_sql(
    table: str,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
) -> str:
    """Oracle twin of :func:`percentile_rank_normalize` — same rank
    window, same tie-break, same truncating ppm."""
    return f"""
WITH r AS (
  SELECT {id_col}, {group_col}, {score_col},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {score_col} ASC, {id_col} ASC) AS rnk,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM {table}
)
SELECT {id_col}, {group_col}, {score_col},
       CAST((rnk - 1) * 1000000 // greatest(n - 1, 1) AS BIGINT) AS pr_ppm
FROM r ORDER BY {id_col}
"""


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping fixed-size document chunking (r9) — the RAG/embedding
    preprocessing step: cut each document into ``chunk_chars``-character
    windows advancing by ``chunk_chars − overlap``, so consecutive chunks
    share ``overlap`` characters of context. Boundary rules (all exactly
    reproducible by any engine, no tokenizer dependence):

    - a document of length ≤ chunk_chars is ONE chunk (itself);
    - otherwise n = 1 + ceil((len − chunk_chars) / stride) chunks, which
      is precisely enough that the last chunk reaches the end of the
      document (it may be shorter than chunk_chars — a tail, never empty,
      never a duplicate of the previous chunk's span start);
    - NULL or empty documents emit no chunks.

    Output ``(id, chunk_idx, chunk_start, chunk_text, chunk_len)`` with
    0-based chunk_start character offsets (ML-convention span offsets).

    Plan shape: map-only — one integer expression computes the chunk
    count, posexplode(sequence(...)) generates indices, substring slices
    the text; ZERO shuffles, fully pipelined inside whole-stage codegen's
    Generate, and the output is partition-local to the input (chunk
    writers inherit the corpus partitioning). At 100 TB this is the shape
    you want: chunking is embarrassingly parallel and must never pay an
    exchange.
    """
    if not (0 <= overlap < chunk_chars):
        raise ValueError(
            f"need 0 <= overlap < chunk_chars, got overlap={overlap}, "
            f"chunk_chars={chunk_chars}"
        )
    stride = chunk_chars - overlap
    ln = F.char_length(F.col(text_col))
    n_chunks = F.when(ln <= chunk_chars, F.lit(1)).otherwise(
        F.lit(1)
        + F.expr(
            f"div(char_length({text_col}) - {chunk_chars} + {stride - 1},"
            f" {stride})"
        )
    )
    return (
        df.filter(ln > 0)
        .select(
            F.col(id_col),
            F.posexplode(
                F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
            ).alias("chunk_idx", "_i"),
            F.col(text_col),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx").cast("long") * stride).alias("chunk_start"),
            F.expr(
                f"substring({text_col}, chunk_idx * {stride} + 1,"
                f" {chunk_chars})"
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.char_length("chunk_text").cast("long"))
    )


def chunk_documents_sql(
    table: str = "documents",
    chunk_chars: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: bool = True,
) -> str:
    """Oracle twin of :func:`chunk_documents` — same chunk-count
    formula, same 1-based substring slicing (codepoint semantics in
    both engines)."""
    stride = chunk_chars - overlap
    n = (
        f"CASE WHEN length({text_col}) <= {chunk_chars} THEN 1 "
        f"ELSE 1 + (length({text_col}) - {chunk_chars} + {stride - 1})"
        f" // {stride} END"
    )
    sql = f"""
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {stride} AS BIGINT) AS chunk_start,
       substring({text_col}, CAST(i * {stride} + 1 AS INTEGER),
                 {chunk_chars}) AS chunk_text,
       CAST(length(substring({text_col},
                 CAST(i * {stride} + 1 AS INTEGER), {chunk_chars}))
            AS BIGINT) AS chunk_len
FROM {table}, unnest(generate_series(0, ({n}) - 1)) AS t(i)
WHERE {text_col} IS NOT NULL AND length({text_col}) > 0
"""
    if order:
        sql += f"ORDER BY {id_col}, chunk_idx"
    return sql


def top_p_select(
    df: DataFrame,
    group_cols,
    weight_col: str,
    id_col: str,
    p_num: int,
    p_den: int,
) -> DataFrame:
    """Nucleus (top-p) truncation per group: keep the SMALLEST prefix
    of rows — heaviest first, ties broken by ``id_col`` ascending —
    whose cumulative weight reaches fraction p of the group total.
    The vocabulary-truncation / mixture-clipping / source-capping
    primitive: "the tokens covering 80% of each language's mass",
    "the domains covering 95% of the crawl".

    Keep rule (standard nucleus semantics, exact in integers): a row
    is kept iff the cumulative weight BEFORE it has not yet reached
    p·total — so the first row crossing the threshold is included and
    coverage ≥ p is guaranteed with the fewest rows. Weights must be
    non-negative integers (counts); the rule multiplies through by
    ``p_den`` so no division happens at all.

    Determinism: ties in weight are ordered by ``id_col``, making the
    kept SET (not just its size) reproducible across partitionings —
    required because selection identity matters here, unlike
    trim-style cuts where any k-smallest multiset is equivalent.

    Scale shape: one shuffle on the group key; the group total and the
    running sum are two frames over the same window partitioning. The
    per-group timeline lives in one task — for a group with billions
    of DISTINCT weights, pre-aggregate equal weights first (this
    operator is downstream of a count agg in every intended use, so
    rows per group = distinct items, already the compact form).

    Returns kept rows: ``(group_cols…, id_col, weight, rank,
    cum_weight, group_total, cum_share_ppm)`` ordered.
    """
    from pyspark.sql import Window

    if not (0 < p_num <= p_den):
        raise ValueError(f"need 0 < p_num <= p_den, got {p_num}/{p_den}")
    gcols = list(group_cols)
    w_ord = Window.partitionBy(*gcols).orderBy(
        F.col(weight_col).desc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy(*gcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        df.withColumn("__w", F.col(weight_col).cast("long"))
        .withColumn("rank", F.row_number().over(w_ord))
        .withColumn(
            "cum_weight",
            F.sum("__w").over(
                Window.partitionBy(*gcols)
                .orderBy(F.col(weight_col).desc(), F.col(id_col).asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("group_total", F.sum("__w").over(w_all))
    )
    kept = staged.filter(
        (F.col("cum_weight") - F.col("__w")) * p_den
        < F.col("group_total") * p_num
    )
    return kept.select(
        *gcols,
        F.col(id_col),
        F.col("__w").alias("weight"),
        F.col("rank").cast("long").alias("rank"),
        F.col("cum_weight").cast("long").alias("cum_weight"),
        F.col("group_total").cast("long").alias("group_total"),
        F.expr("div(1000000 * cum_weight, group_total)").alias(
            "cum_share_ppm"
        ),
    ).orderBy(*gcols, "rank")


def top_p_select_sql(
    table: str,
    group_cols,
    weight_col: str,
    id_col: str,
    p_num: int,
    p_den: int,
) -> str:
    """DuckDB twin of :func:`top_p_select` — same ordering, same
    division-free keep rule, same ppm arithmetic."""
    g = ", ".join(group_cols)
    return f"""
WITH staged AS (
  SELECT {g}, {id_col}, CAST({weight_col} AS BIGINT) AS w,
         ROW_NUMBER() OVER
           (PARTITION BY {g}
            ORDER BY {weight_col} DESC, {id_col} ASC) AS rank,
         SUM(CAST({weight_col} AS BIGINT)) OVER
           (PARTITION BY {g}
            ORDER BY {weight_col} DESC, {id_col} ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_weight,
         SUM(CAST({weight_col} AS BIGINT)) OVER (PARTITION BY {g})
             AS group_total
  FROM {table}
)
SELECT {g}, {id_col}, w AS weight, CAST(rank AS BIGINT) AS rank,
       CAST(cum_weight AS BIGINT) AS cum_weight,
       CAST(group_total AS BIGINT) AS group_total,
       CAST(1000000 * cum_weight // group_total AS BIGINT)
           AS cum_share_ppm
FROM staged
WHERE (cum_weight - w) * {p_den} < group_total * {p_num}
ORDER BY {g}, rank
"""
