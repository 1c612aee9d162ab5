#!/usr/bin/env python
"""Boilerplate-skew rung for the containment join's hot/cold split (r13).

The r12 plan audit left one residual in containment_prefix_pairs: a
shingle with df(w) ~ corpus size sends its ENTIRE postings list — and,
when any doc's prefix carries that shingle, the entire pair production
for it — through ONE shuffle partition of the candidate join. AQE can
split the sort-merge partition after the fact; ``hot_df_cap`` removes
the shape from the plan instead (hot postings stream map-side through a
broadcast of the tiny prefix side).

This rung makes the straggler measurable on purpose:

- N container docs, each with UNIQUE content words plus a shared 8-word
  boilerplate footer -> ~6 hot shingles with df(w) = N;
- P footer-only docs whose whole prefix is hot shingles -> P x N true
  contained pairs, ALL of which must be produced via hot keys.

Unsplit, those P x N x 6 candidate rows are produced by at most 6 tasks
(one per hot shingle, whatever spark.sql.shuffle.partitions says);
split, the broadcast branch produces them across every postings
partition. Wall-clock ratio ~ available parallelism.

Timed: candidate join + verification -> count (the full operator), same
code both modes, corpus pre-written to parquet (untimed). Results in
SCALING.md "Containment hot/cold split rung".

Usage: python tools/skew_rung.py [--n=100000] [--pure=32]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/skew_rung"
BOILER = "all rights reserved terms and conditions apply to this document"


def build_corpus(spark, n: int, pure: int, out: str) -> None:
    from pyspark.sql import functions as F

    # 16 unique content words per container doc (id-derived, no two
    # docs share one) + the shared footer; footer-only docs get ids
    # above the container range
    containers = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.expr(
                "array_join(transform(sequence(0, 15),"
                " j -> concat('c', id, 'w', j)), ' ')"
            ),
            F.lit(BOILER),
        ).alias("text"),
    )
    pures = spark.range(pure).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(BOILER).alias("text"),
    )
    containers.unionByName(pures).repartition(32).write.mode(
        "overwrite"
    ).parquet(out)


def run(mode: str, corpus: str, hot_df_cap: int | None) -> dict:
    from xml_to_parquet_spark.functions.dedup import containment_prefix_pairs
    from xml_to_parquet_spark.session import get_spark

    spark = get_spark(app_name=f"skew_rung_{mode}")
    df = spark.read.parquet(corpus)
    t0 = time.monotonic()
    pairs = containment_prefix_pairs(
        df, t_num=4, t_den=5, hot_df_cap=hot_df_cap
    ).count()
    wall = time.monotonic() - t0
    return {"mode": mode, "pairs": pairs, "wall_s": round(wall, 2)}


def main() -> int:
    n = 100_000
    pure = 32
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--pure="):
            pure = int(a.split("=", 1)[1])
    from xml_to_parquet_spark.session import get_spark

    os.makedirs(WORK, exist_ok=True)
    corpus = os.path.join(WORK, f"corpus_{n}_{pure}")
    spark = get_spark(app_name="skew_rung_gen")
    build_corpus(spark, n, pure, corpus)

    results = [
        run("unsplit", corpus, None),
        run("hot_cold_split", corpus, 1000),
    ]
    if results[0]["pairs"] != results[1]["pairs"]:
        print(json.dumps({"error": "pair counts differ", "results": results}))
        return 1
    # true pairs: every footer-only doc in every container (and in each
    # other, both directions)
    expect_min = pure * n
    ok = results[0]["pairs"] >= expect_min
    print(
        json.dumps(
            {
                "rung": "containment_skew",
                "n_containers": n,
                "n_pure": pure,
                "pairs": results[0]["pairs"],
                "unsplit_wall_s": results[0]["wall_s"],
                "split_wall_s": results[1]["wall_s"],
                "speedup": round(
                    results[0]["wall_s"] / max(results[1]["wall_s"], 1e-9), 2
                ),
                "pairs_sane": ok,
            }
        )
    )
    shutil.rmtree(WORK, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
