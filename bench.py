"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall time of all headline queries, where each query's time is
the MIN of 3 trials (timeit-style best-of). Rationale: (a) this VM shows
sporadic multi-second freezes unrelated to the workload (identical jobs
measured 0.8s-176s with no GC pause and no steal spike — see git history);
(b) the first trial of the first queries additionally pays one-time JVM/
codegen warmup that belongs to the session, not the query (measured: q01
cold 3.7s vs steady-state 1.3s including plan build). Min over 3 trials
measures the engine's steady-state cost per query; every trial still
executes the full plan from a freshly built DataFrame via the noop sink
(no caching between trials — only OS page cache and JIT state are warm,
exactly what a resident engine would have).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from xml_to_parquet_spark.session import get_spark
    from xml_to_parquet_spark.workload import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footer caches with one tiny action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    import statistics

    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        samples = []
        for _ in range(trials):
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            # noop sink materializes every row/column without count()'s
            # column-pruning shortcut and without sink I/O in the measurement
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(min(samples), 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    vals = sorted(timings.values())
    print(
        json.dumps(
            {
                "metric": "workload_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                # normalization context: total wall grows with catalog SIZE
                # (59 queries in r1 → 84+ now); per-query stats are the
                # round-over-round comparable numbers
                "n_queries": len(timings),
                "per_query_mean": round(statistics.mean(vals), 3),
                "per_query_median": round(statistics.median(vals), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
