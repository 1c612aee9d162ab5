"""Declarative data-quality constraint suite, evaluated in ONE pass.

The Deequ shape (Schelter et al., VLDB'18 "Automating Large-Scale Data
Quality Verification") re-expressed as plain Spark aggregates: a user
declares WHAT must hold (completeness, value ranges, patterns, set
membership, key distinctness, referential integrity) and the engine
compiles every check into a conditional aggregate over a SINGLE scan of
the table — no per-constraint jobs, no driver loop. The reference repo
validates per-file XML (validation/xml_validation.py cites its R
source); this module is the table-level counterpart a training-data
pipeline needs before publishing a snapshot.

Scale shape, in order of cost:

- **rate checks** (not_null / in_range / matches / member_of) are
  row-local CASE expressions summed map-side — one scan, partial
  aggregation, a single 1-row exchange. Adding a check adds a column to
  the agg, not a pass over the data.
- **ref checks** join the fact against ``broadcast(dim.select(key)
  .distinct())`` BEFORE the same single agg — dims are the bounded side
  (dimension keys, blocklists); for an unbounded "dim" use the Bloom
  pre-filter (sketches.bloom_bitmap) and accept its one-sided error.
- **distinctness checks** add COUNT(DISTINCT col) to the agg: Spark
  plans an Expand (one input replica per distinct agg), so each
  ``unique()`` check re-shuffles the key column. At 10⁹+ rows swap in
  ``approx_count_distinct`` / the HLL sketch (sketches.hll_*) — the
  oracle-checked exact form here is the correctness anchor.
- **functional-dependency checks** are the exception to the single
  agg: each declared ``functional_dep(lhs, rhs)`` adds one two-stage
  aggregation (groupBy(lhs, rhs) count → groupBy(lhs) max → sum),
  both stages partial-agg friendly, its 1-row result cross-joined
  back into the report. Metric = ppm of rows that agree with their
  lhs-group's majority rhs value — 1e6 iff lhs → rhs holds exactly
  (NULL is a value on both sides, matching GROUP BY semantics in
  both engines).

Every metric is an integer ppm (floor(1e6·passing/total)): sums of 0/1
are exact, integer floor-division is engine-identical, so the DuckDB
oracle replays the whole report bit-for-bit (constraint_report_sql).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


@dataclass(frozen=True)
class Check:
    """One declarative constraint.

    ``kind``: 'rate' (row-local predicate), 'distinctness'
    (COUNT(DISTINCT col)/COUNT(*)), or 'ref' (fact key present in a
    dimension). ``metric_ppm`` must land in [min_ppm, max_ppm] for the
    check to pass.
    """

    name: str
    kind: str
    min_ppm: int
    max_ppm: int
    # lazy thunk, not a Column: building a Column needs an active
    # SparkContext, and Check specs are constructed at import time
    predicate: Callable[[], Column] | None = None  # kind='rate'
    predicate_sql: str | None = None
    col: str | None = None  # kind='distinctness' | 'ref' | 'fd' (rhs)
    dim_table: str | None = None  # kind='ref'
    dim_col: str | None = None  # kind='ref'
    lhs: tuple[str, ...] | None = None  # kind='fd'


def not_null(col: str, min_ppm: int = PPM, name: str | None = None) -> Check:
    """Completeness: rate of rows where ``col`` is non-null."""
    return Check(
        name=name or f"{col}_not_null",
        kind="rate",
        min_ppm=min_ppm,
        max_ppm=PPM,
        predicate=lambda: F.col(col).isNotNull(),
        predicate_sql=f"{col} IS NOT NULL",
    )


def in_range(
    col: str,
    lo,
    hi,
    min_ppm: int = PPM,
    name: str | None = None,
) -> Check:
    """Rate of rows with ``lo <= col <= hi`` (NULL counts as failing)."""
    return Check(
        name=name or f"{col}_in_range",
        kind="rate",
        min_ppm=min_ppm,
        max_ppm=PPM,
        predicate=lambda: F.col(col).between(F.lit(lo), F.lit(hi)),
        predicate_sql=f"{col} BETWEEN {lo!r} AND {hi!r}",
    )


def matches(
    col: str, regex: str, min_ppm: int = PPM, name: str | None = None
) -> Check:
    """Rate of rows where ``col`` matches ``regex`` (partial match, the
    shared rlike/regexp_matches semantics; anchor with ^...$ for full)."""
    if "'" in regex:
        raise ValueError("single quotes in regex break the SQL twin")
    return Check(
        name=name or f"{col}_matches",
        kind="rate",
        min_ppm=min_ppm,
        max_ppm=PPM,
        predicate=lambda: F.col(col).rlike(regex),
        predicate_sql=f"regexp_matches({col}, '{regex}')",
    )


def member_of(
    col: str, values: list, min_ppm: int = PPM, name: str | None = None
) -> Check:
    """Rate of rows where ``col`` is one of ``values``."""
    quoted = ", ".join(repr(v) for v in values)
    return Check(
        name=name or f"{col}_member_of",
        kind="rate",
        min_ppm=min_ppm,
        max_ppm=PPM,
        predicate=lambda: F.col(col).isin(values),
        predicate_sql=f"{col} IN ({quoted})",
    )


def unique(col: str, min_ppm: int = PPM, name: str | None = None) -> Check:
    """Distinctness: COUNT(DISTINCT col)/COUNT(*) — 1e6 ppm iff every
    row carries a distinct non-null value (a key-worthiness check)."""
    return Check(
        name=name or f"{col}_unique",
        kind="distinctness",
        min_ppm=min_ppm,
        max_ppm=PPM,
        col=col,
    )


def ref_integrity(
    col: str,
    dim_table: str,
    dim_col: str,
    min_ppm: int = PPM,
    name: str | None = None,
) -> Check:
    """Referential integrity: rate of rows whose ``col`` is NULL or
    present in ``dim_table.dim_col`` (NULL keys don't violate RI —
    declare a separate not_null check if they should)."""
    return Check(
        name=name or f"{col}_in_{dim_table}",
        kind="ref",
        min_ppm=min_ppm,
        max_ppm=PPM,
        col=col,
        dim_table=dim_table,
        dim_col=dim_col,
    )


def functional_dep(
    lhs: str | tuple[str, ...],
    rhs: str,
    min_ppm: int = PPM,
    name: str | None = None,
) -> Check:
    """Functional dependency lhs → rhs: ppm of rows agreeing with their
    lhs-group's most common rhs value. 1e6 iff the FD holds exactly;
    lower values measure how far the data is from the dependency
    (Deequ/Metanome-style FD profiling). NULL is an ordinary value on
    both sides."""
    lhs_t = (lhs,) if isinstance(lhs, str) else tuple(lhs)
    if rhs in lhs_t:
        raise ValueError(f"rhs {rhs!r} cannot appear in lhs {lhs_t}")
    return Check(
        name=name or f"{'_'.join(lhs_t)}_determines_{rhs}",
        kind="fd",
        min_ppm=min_ppm,
        max_ppm=PPM,
        col=rhs,
        lhs=lhs_t,
    )


REPORT_COLS = ["constraint", "kind", "metric_ppm", "min_ppm", "max_ppm",
               "passed"]


def constraint_report(
    df: DataFrame,
    checks: list[Check],
    dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate every check in one aggregate pass over ``df`` (fd
    checks excepted — each adds its own two-stage aggregation, see the
    module docstring).

    Returns one row per check: ``(constraint, kind, metric_ppm,
    min_ppm, max_ppm, passed)`` ordered by constraint name. On an empty
    table every metric is NULL and ``passed`` is false (a constraint
    cannot be vouched for by zero rows).

    ``dims`` maps each ref check's ``dim_table`` name to its DataFrame;
    dim key sets are deduplicated and broadcast, so the fact table is
    still scanned exactly once.
    """
    dims = dims or {}
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {sorted(names)}")

    enriched = df
    hit_cols: dict[str, str] = {}
    for i, ck in enumerate(checks):
        if ck.kind != "ref":
            continue
        if ck.dim_table not in dims:
            raise ValueError(
                f"ref check {ck.name!r} needs dims[{ck.dim_table!r}]"
            )
        hit = f"__ref_hit_{i}"
        dim_keys = (
            dims[ck.dim_table]
            .select(F.col(ck.dim_col).alias(f"__ref_key_{i}"))
            .distinct()
            .withColumn(hit, F.lit(1))
        )
        enriched = enriched.join(
            F.broadcast(dim_keys),
            on=enriched[ck.col] == dim_keys[f"__ref_key_{i}"],
            how="left",
        ).drop(f"__ref_key_{i}")
        hit_cols[ck.name] = hit

    aggs = [F.count(F.lit(1)).cast("long").alias("__total")]
    fd_checks: list[tuple[int, Check]] = []
    for i, ck in enumerate(checks):
        if ck.kind == "rate":
            cond = ck.predicate()
        elif ck.kind == "ref":
            cond = F.col(ck.col).isNull() | F.col(hit_cols[ck.name]).isNotNull()
        elif ck.kind == "distinctness":
            aggs.append(
                F.countDistinct(F.col(ck.col)).cast("long").alias(f"__m_{i}")
            )
            continue
        elif ck.kind == "fd":
            fd_checks.append((i, ck))
            continue
        else:
            raise ValueError(f"unknown check kind {ck.kind!r}")
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__m_{i}")
        )

    row = enriched.agg(*aggs)
    for i, ck in fd_checks:
        # conforming rows = Σ over lhs groups of the majority rhs count;
        # two partial-agg-friendly stages, 1-row result joined back
        conforming = (
            df.groupBy(*ck.lhs, ck.col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .groupBy(*ck.lhs)
            .agg(F.max("__c").alias("__mx"))
            .agg(F.sum("__mx").cast("long").alias(f"__m_{i}"))
        )
        row = row.crossJoin(F.broadcast(conforming))
    structs = [
        F.struct(
            F.lit(ck.name).alias("constraint"),
            F.lit(ck.kind).alias("kind"),
            F.when(
                F.col("__total") > 0,
                F.expr(f"div({PPM} * __m_{i}, __total)"),
            ).alias("metric_ppm"),
            F.lit(ck.min_ppm).cast("long").alias("min_ppm"),
            F.lit(ck.max_ppm).cast("long").alias("max_ppm"),
        )
        for i, ck in enumerate(checks)
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .withColumn(
            "passed",
            F.coalesce(
                F.col("metric_ppm").between(
                    F.col("min_ppm"), F.col("max_ppm")
                ),
                F.lit(False),
            ),
        )
        .orderBy("constraint")
    )


def constraint_report_sql(table: str, checks: list[Check]) -> str:
    """ANSI twin of :func:`constraint_report` — the same single-agg
    shape (rate/distinctness metrics in one CTE over one scan, ref
    metrics as IN-subquery aggregates), identical integer-ppm
    arithmetic, so a driver hash-match proves the whole report."""
    agg_items = ["CAST(COUNT(*) AS BIGINT) AS total"]
    fd_ctes = []
    for i, ck in enumerate(checks):
        if ck.kind == "rate":
            agg_items.append(
                f"SUM(CASE WHEN {ck.predicate_sql} THEN 1 ELSE 0 END) "
                f"AS m_{i}"
            )
        elif ck.kind == "distinctness":
            agg_items.append(f"COUNT(DISTINCT {ck.col}) AS m_{i}")
        elif ck.kind == "ref":
            agg_items.append(
                f"SUM(CASE WHEN {ck.col} IS NULL OR {ck.col} IN "
                f"(SELECT {ck.dim_col} FROM {ck.dim_table}) "
                f"THEN 1 ELSE 0 END) AS m_{i}"
            )
        elif ck.kind == "fd":
            lhs = ", ".join(ck.lhs)
            fd_ctes.append(
                f"""fd_{i} AS (
  SELECT CAST(SUM(mx) AS BIGINT) AS m_{i} FROM (
    SELECT MAX(c) AS mx FROM (
      SELECT {lhs}, {ck.col}, COUNT(*) AS c
      FROM {table} GROUP BY {lhs}, {ck.col}
    ) GROUP BY {lhs}
  )
)"""
            )
    base = f"SELECT {', '.join(agg_items)} FROM {table}"
    fd_from = "".join(f", fd_{i}" for i, ck in enumerate(checks)
                      if ck.kind == "fd")
    rows = []
    for i, ck in enumerate(checks):
        rows.append(
            f"SELECT '{ck.name}' AS \"constraint\", '{ck.kind}' AS kind, "
            f"CASE WHEN total > 0 THEN CAST({PPM} * m_{i} // total "
            f"AS BIGINT) END AS metric_ppm, "
            f"CAST({ck.min_ppm} AS BIGINT) AS min_ppm, "
            f"CAST({ck.max_ppm} AS BIGINT) AS max_ppm FROM base{fd_from}"
        )
    union = "\nUNION ALL\n".join(rows)
    fd_block = "".join(f",\n{c}" for c in fd_ctes)
    return f"""
WITH base AS ({base}){fd_block},
rep AS (
{union}
)
SELECT "constraint", kind, metric_ppm, min_ppm, max_ppm,
       COALESCE(metric_ppm BETWEEN min_ppm AND max_ppm, FALSE) AS passed
FROM rep
ORDER BY "constraint"
"""


def reject_reason_sql(checks: list[Check]) -> str:
    """ANSI twin of the ``sinks.publish.quarantine_router`` gate: a CASE
    expression naming the FIRST failing rate check in declared order
    (NULL predicate = failing), NULL when every check passes."""
    arms = []
    for ck in checks:
        if ck.kind != "rate":
            raise ValueError(
                f"reject_reason_sql needs rate checks; {ck.name!r} is "
                f"{ck.kind!r}"
            )
        arms.append(
            f"WHEN NOT COALESCE({ck.predicate_sql}, FALSE) "
            f"THEN '{ck.name}'"
        )
    return "CASE " + " ".join(arms) + " END"
