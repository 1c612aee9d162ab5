"""Time a subset of catalog queries (noop sink, min-of-N, CPU twin).

Optimization-round measurement helper: same methodology as bench.py
(fresh DataFrame per trial, noop sink, min over trials, engine_cpu_ms
twin) but scoped to the named queries so an optimize→measure loop does
not pay the full 180-query sweep. Never writes the canonical sidecars.

Usage:
    python tools/qtime.py [--trials=3] [--sf=/root/testdata/sf0.1] q1 q2 ...
    python tools/qtime.py --explain q1      # print .explain('formatted')
Names may be full keys (q294_containment_pairs) or bare slugs
(containment_pairs).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    trials = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    explain_only = False
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--trials="):
            trials = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--explain":
            explain_only = True
        else:
            names.append(a)

    from xml_to_parquet_spark.session import get_spark, set_log_level
    from xml_to_parquet_spark.workload import KEY_BY_SLUG, QUERIES

    resolved = []
    for n in names:
        if n in QUERIES:
            resolved.append(n)
        elif n in KEY_BY_SLUG:
            resolved.append(KEY_BY_SLUG[n])
        else:
            raise SystemExit(f"unknown query {n!r}")

    spark = get_spark("qtime")
    set_log_level(spark, "ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    if explain_only:
        for key in resolved:
            df = QUERIES[key].fn(spark, sf_dir)
            print(f"=== {key} ===")
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        return

    from xml_to_parquet_spark.logging_utils import engine_cpu_ms

    out: dict[str, dict[str, float]] = {}
    for key in resolved:
        spec = QUERIES[key]
        walls, cpus = [], []
        for _ in range(trials):
            c0 = engine_cpu_ms(spark)
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            c1 = engine_cpu_ms(spark)
            if c0 is not None and c1 is not None:
                cpus.append(c1 - c0)
        out[key] = {
            "wall": round(min(walls), 3),
            "cpu": round(min(cpus) / 1000.0, 3) if cpus else None,
            "walls": [round(w, 3) for w in walls],
        }
        print(f"{key:42s} wall={out[key]['wall']:8.3f} "
              f"cpu={out[key]['cpu']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
