"""Core relational operators (SURVEY.md §2.2, §2.3, §2.6, §2.7).

Everything here is a thin, named wrapper over declarative DataFrame ops so
Catalyst gets the whole plan (pushdown, pruning, join reordering for free).
The wrappers exist to (a) give each reference operator a citable Spark
counterpart and (b) centralize the scale-relevant decisions (broadcast
hints, unionByName semantics).

Reference parity notes (file:line cites point into /root/reference):
- project / drop        R/star_transformer.R:52,118-121 (P1, P2)
- filter_not_null       R/star_transformer.R:53 (P3)
- union_by_name         rbindlist(fill=TRUE) at every merge point,
                        R/xml_parser.R:117 etc. (U1) — the most load-bearing
                        primitive in the reference pipeline
- distinct_values       R/star_transformer.R:55 (U2)
- sort_limit            R/star_transformer.R:56, R/main.R:95 (O1, O2)
- left_broadcast_join   R/star_transformer.R:133-144 (J1, J2) — dims are
                        cardinality-capped (<50 values), so broadcast hash
                        join is always the right physical plan
- chained_dim_joins     R/star_transformer.R:100-107 (J3)
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Column projection (P1). Catalyst prunes the parquet scan to `cols`."""
    return df.select(*cols)


def drop_columns(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Drop columns if present (P2) — mirrors select(-any_of(...))."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def filter_not_null(df: DataFrame, col: str) -> DataFrame:
    """Null-filter predicate (P3); pushed to the parquet scan by Catalyst."""
    return df.filter(F.col(col).isNotNull())


def union_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union-all with ragged-schema alignment (U1).

    Missing columns null-filled — identical semantics to the reference's
    ``rbindlist(fill=TRUE)``. At scale this is a zero-shuffle operator:
    union is purely logical, partitions are concatenated.
    """
    if not dfs:
        raise ValueError("union_by_name requires at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def distinct_values(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Distinct / dedupe (U2). One shuffle on the chosen columns; partial
    (map-side) aggregation keeps shuffled bytes proportional to distinct
    count, not row count — safe at 100 TB for capped-cardinality columns."""
    if cols:
        return df.select(*cols).distinct()
    return df.distinct()


def sort_limit(
    df: DataFrame, by: Sequence[str], ascending: bool = True, limit: int | None = None
) -> DataFrame:
    """Sort + optional limit (O1, O2). With a limit, Spark plans TakeOrdered
    (per-partition top-k + merge) instead of a global sort — no full shuffle."""
    cols = [F.col(c).asc() if ascending else F.col(c).desc() for c in by]
    out = df.orderBy(*cols)
    return out.limit(limit) if limit is not None else out


def left_broadcast_join(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "left"
) -> DataFrame:
    """Left equi-join with an explicit broadcast hint on the dim side
    (J1/J2). Dimension tables out of the star transformer are bounded by the
    cardinality cap, so broadcasting avoids shuffling the (huge) fact side
    entirely — the only plan that survives a 100 TB fact table."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def chained_dim_joins(
    fact: DataFrame, dims: Sequence[tuple[DataFrame, str | Sequence[str]]]
) -> DataFrame:
    """Fold of dimension-key joins over the fact table (J3).

    Catalyst sees one logical plan for the whole chain and plans all joins
    together; each dim side is broadcast, so the fact is never shuffled.
    """
    return reduce(lambda f, d: left_broadcast_join(f, d[0], d[1]), dims, fact)
