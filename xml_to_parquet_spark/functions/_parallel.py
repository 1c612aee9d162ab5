"""Upstream-parallelism sizing for row-amplifying / per-row-heavy stages.

A generator (explode) or a wide per-row aggregate multiplies the WORK per
input row by 10-1000x, so the stage's parallelism must be sized to its
output, not to the input's byte count: a small input that fits one parquet
split would otherwise run the whole pre-shuffle stage on a single core
(measured at sf0.1: substring-dedup 2.79s -> 1.24s, rare-gram gate
6.1s -> 1.3s just from this). At production scale input splits already
meet or exceed the core count and the helper is a no-op — it never
repartitions DOWN and never touches an already-parallel input, so the
added Exchange exists only in exactly the regime where its cost (shuffling
the small input once) is trivially covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def size_to_cores(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` iff it currently
    has fewer partitions; no-op for streaming frames and already-parallel
    inputs."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df
