#!/usr/bin/env python
"""Heavy-hitters rung: mg_heavy_hitters vs the plain full-shuffle plan.

The claim to measure (sketches.mg_heavy_hitters docstring): when the
grouping column's cardinality approaches the row count, the plain
``GROUP BY col ORDER BY count(*) DESC LIMIT k`` plan's shuffle carries
~one partial-count row per (partition, distinct value) — at 100 TB that
shuffle IS the job — while the MG screen shuffles ≤ counters rows per
Arrow batch plus a sentinel, then recounts only the surviving
candidates behind a broadcast semi-join.

Corpus: N rows over a D-value flat floor (counts ~N/D each) plus two
genuine heavy hitters (k=2: on a flat floor, ranks 3+ are
uncertifiable BY DESIGN — the certificate refuses them). Flat floors
are MG's worst case (maximum trim slack), so this is not a
cherry-picked distribution. Corpus is written to parquet untimed; both
plans read the same files. Arrow batch size is raised to 1M rows — the
screen's shuffle volume is counters x batches, so batch sizing is the
operator's principal tuning knob (documented here, set in-session).

HONESTY NOTE (first run, 50M rows / 5M distinct, local[32]): the plain
plan WINS on wall locally (~4.7s vs ~12s) — localhost shuffle is
memory-speed and Tungsten's partial hash-agg is very fast, while the
screen pays the Python/Arrow round trip. The number that transfers to
a 1000-executor cluster is the shuffle-rows column: what the plain
plan puts on the NETWORK scales with (partitions x distinct), the
screen's with (counters x batches). This rung reports both and makes
no local wall claim.

Usage: python tools/hh_rung.py [--rows=50000000] [--distinct=5000000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/hh_rung"


def main() -> int:
    rows = 50_000_000
    distinct = 5_000_000
    for a in sys.argv[1:]:
        if a.startswith("--rows="):
            rows = int(a.split("=", 1)[1])
        elif a.startswith("--distinct="):
            distinct = int(a.split("=", 1)[1])
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.functions.sketches import mg_heavy_hitters
    from xml_to_parquet_spark.session import get_spark

    spark = get_spark(app_name="hh_rung")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000000")
    heavy = rows // 100  # two heavies at 1% each — far above the floor
    corpus = os.path.join(WORK, f"corpus_{rows}_{distinct}")
    (
        spark.range(rows)
        .select((F.col("id") % distinct + 1000).alias("v"))
        .unionByName(spark.range(heavy).select(F.lit(7).alias("v")))
        .unionByName(spark.range(heavy // 2).select(F.lit(13).alias("v")))
        .write.mode("overwrite")
        .parquet(corpus)
    )
    df = spark.read.parquet(corpus)

    t0 = time.monotonic()
    plain = [
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "v")
        .limit(2)
        .collect()
    ]
    plain_s = time.monotonic() - t0

    t0 = time.monotonic()
    mg = [
        (r["value"], r["cnt"])
        for r in mg_heavy_hitters(df, "v", k=2, counters=4096).collect()
    ]
    mg_s = time.monotonic() - t0

    # Shuffle-volume twin (the cluster-relevant number: localhost
    # shuffle is ~free, cluster shuffle is the network): the plain
    # plan's exchange carries one partial-count row per (partition,
    # value); the MG screen's exchange carries its summary rows.
    from xml_to_parquet_spark.functions.sketches import mg_screen

    plain_shuffle_rows = (
        df.select(F.spark_partition_id().alias("p"), "v")
        .distinct()
        .count()
    )
    mg_shuffle_rows = mg_screen(df, "v", 4096).count()

    ok = plain == mg
    print(
        json.dumps(
            {
                "rung": "heavy_hitters",
                "rows": rows + heavy + heavy // 2,
                "distinct": distinct + 2,
                "identical": ok,
                "plain_groupby_wall_s": round(plain_s, 2),
                "mg_wall_s": round(mg_s, 2),
                "wall_ratio_mg_over_plain": round(mg_s / max(plain_s, 1e-9), 2),
                "plain_shuffle_rows": plain_shuffle_rows,
                "mg_shuffle_rows": mg_shuffle_rows,
                "shuffle_reduction": round(
                    plain_shuffle_rows / max(mg_shuffle_rows, 1), 1
                ),
                "top2": mg[:2],
            }
        )
    )
    shutil.rmtree(WORK, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
