"""Binned range join — the scale-safe plan for interval predicates.

The reference has no range/interval joins (SURVEY §2.3 "not present");
this is a capability-plus operator for the band/tier lookups an analytics
engine needs (price bands, SLA tiers, time buckets with irregular edges).

The naive Spark plan for ``fact JOIN bands ON v >= lo AND v < hi`` is a
BroadcastNestedLoopJoin: every fact row is tested against every band —
O(N × B) comparisons with no pruning, and a full cartesian if the bands
side outgrows broadcast. The binned plan:

1. decompose each band interval into the fixed-width bins it overlaps
   (small side only: B bands × a few bins each),
2. equi-join fact rows to candidate bands on ``floor(v / bin_width)`` —
   a broadcast HASH join, one probe per fact row,
3. apply the exact interval predicate to the (tiny) candidate set.

At 100 TB this turns the interval join into a map-side hash probe with no
shuffle of the fact table and per-row candidate sets bounded by
(bands overlapping one bin). The same trick with two-sided binning handles
interval-interval overlap joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` rows to the band whose ``[lo, hi)`` interval contains
    ``value_col``, via bin-decomposition + broadcast equi-join.

    ``bands`` must be small (broadcastable); intervals may be irregular and
    may overlap (overlapping bands yield one output row per matching band).
    """
    bin_w = F.lit(float(bin_width))
    # every bin index the interval [lo, hi) touches; floor(hi/w) over-covers
    # when hi is a bin boundary — harmless, the exact predicate prunes it
    binned_bands = bands.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_w).cast("long"),
                F.floor(F.col(hi_col) / bin_w).cast("long"),
            )
        ),
    )
    probe = fact.withColumn(
        "__bin", F.floor(F.col(value_col) / bin_w).cast("long")
    )
    return (
        probe.join(F.broadcast(binned_bands), on="__bin", how=how)
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__bin")
    )
