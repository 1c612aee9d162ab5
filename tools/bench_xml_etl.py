"""Apples-to-apples XML→Parquet ETL throughput vs the reference's headline.

The reference publishes exactly one benchmark (README.md:404-412): 100 XML
files / 50 MB end-to-end in 12 s on 8 cores (≈4.2 MB/s sustained, ≈8.3
files/s), 15 s with validation.  This harness reproduces that workload
shape against OUR full pipeline (``process_xml_to_parquet``: parse →
flatten → classify → star build → parquet sinks + manifests):

- 100 deterministic XML files, ~50 MB total, ~1000 records/file with
  mixed attribute ids, dimension-grade low-cardinality strings, numeric
  measures, dates, and a filler text column — the record mix the
  reference's schema analyzer expects;
- Spark pinned to local[8] to match the reference's 8-core config;
- timed end-to-end including all sink writes, EXCLUDING one-time session
  startup (the reference's Rscript startup is likewise outside its 12 s);
- a second timed pass with the validation gate on (reference
  ENABLE_VALIDATION=TRUE comparison row).

Usage: python tools/bench_xml_etl.py [--files=100] [--keep]
Prints one JSON line with measured MB/s and the reference-derived floors.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/xml_etl_bench"

REGIONS = ["EU", "US", "APAC", "LATAM", "MEA"]
STATUSES = ["shipped", "pending", "returned"]
FILLER = (
    "standard handling applies to this order line and no special "
    "routing instructions were supplied by the customer desk "
)


def _record(i: int) -> str:
    return (
        f'  <order id="O{i:08d}">\n'
        f"    <customer_name>customer_{i % 997}</customer_name>\n"
        f"    <region>{REGIONS[i % len(REGIONS)]}</region>\n"
        f"    <status>{STATUSES[i % len(STATUSES)]}</status>\n"
        f"    <priority>{1 + i % 5}</priority>\n"
        f"    <price>{(i % 9000) / 100 + 10:.2f}</price>\n"
        f"    <quantity>{1 + i % 40}</quantity>\n"
        f"    <discount>0.0{i % 10}</discount>\n"
        f"    <order_date>2024-{1 + i % 12:02d}-{1 + i % 28:02d}</order_date>\n"
        f"    <notes>{FILLER}lane {i % 23}</notes>\n"
        f"  </order>\n"
    )


def generate(n_files: int, records_per_file: int) -> tuple[str, float]:
    inp = os.path.join(WORK, "input")
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(inp)
    total = 0
    for f in range(n_files):
        base = f * records_per_file
        body = "".join(_record(base + r) for r in range(records_per_file))
        payload = (
            "<?xml version='1.0'?>\n"
            f"<!-- ORDER-BATCH-{f:04d} -->\n"
            f"<orders>\n{body}</orders>\n"
        )
        path = os.path.join(inp, f"orders_{f:04d}.xml")
        with open(path, "w") as fh:
            fh.write(payload)
        total += os.path.getsize(path)
    return inp, total / 1e6


def run_once(spark, inp: str, out_name: str, validate: bool) -> float:
    from xml_to_parquet_spark.pipeline import process_xml_to_parquet
    from xml_to_parquet_spark.sources.xml_source import (
        invalidate_xml_probe_cache,
    )

    invalidate_xml_probe_cache()
    out = os.path.join(WORK, out_name)
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    process_xml_to_parquet(spark, inp, out, validate=validate)
    return time.time() - t0


def main() -> None:
    n_files = 100
    keep = False
    for a in sys.argv[1:]:
        if a.startswith("--files="):
            n_files = int(a.split("=", 1)[1])
        elif a == "--keep":
            keep = True

    # ~500 B/record → ~1000 records ≈ 0.5 MB/file ≈ 50 MB at 100 files
    inp, mb = generate(n_files, records_per_file=1000)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")  # reference ran 8 cores
        .appName("xml_etl_bench")
        .config("spark.sql.shuffle.partitions", "8")
        # small-file corpus tuning (SCALING.md): default 128 MB splits +
        # 4 MB open-cost coalesce 100 half-MB files into ~4 input
        # partitions, leaving 8 cores half idle through parse/persist/agg
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from xml_to_parquet_spark.session import set_log_level

    set_log_level(spark, "ERROR")

    # steady-state measurement (same rationale as bench.py): one throwaway
    # job pays the one-time JVM/codegen warmup that belongs to the session
    spark.createDataFrame([(1,)], "x int").count()

    # min-of-3 (same rationale as bench.py: the box shows sporadic
    # multi-second freezes; min measures the engine's steady-state cost)
    trials = int(os.environ.get("XML_ETL_TRIALS", "3"))
    plain = min(
        run_once(spark, inp, "out_plain", validate=False)
        for _ in range(trials)
    )
    validated = min(
        run_once(spark, inp, "out_validated", validate=True)
        for _ in range(max(1, trials - 1))
    )

    # reference README.md:408-410 rows, keyed by file count
    ref = {100: (12.0, 15.0), 1000: (120.0, 150.0), 10000: (1500.0, 1800.0)}
    ref_sec, ref_val_sec = ref.get(n_files, (None, None))
    result = {
        "metric": "xml_etl_throughput",
        "files": n_files,
        "mb": round(mb, 1),
        "sec": round(plain, 2),
        "mb_per_s": round(mb / plain, 2),
        "files_per_s": round(n_files / plain, 2),
        "sec_validated": round(validated, 2),
        "validation_overhead_pct": round(100 * (validated / plain - 1), 1),
        "reference_sec": ref_sec,
        "reference_validated_sec": ref_val_sec,
        "reference_mb_per_s": 4.2,
        "speedup_vs_reference": round((mb / plain) / 4.2, 2),
        "speedup_vs_reference_row": (
            round(ref_sec / plain, 2) if ref_sec else None
        ),
    }
    print(json.dumps(result, separators=(",", ":")))
    if not keep:
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
