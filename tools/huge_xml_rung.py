"""Single-huge-file XML ingest rung (r12, VERDICT r11 missing #2).

The reference's own stripped test input (R/input/iTunes.xml, see
.MISSING_LARGE_BLOBS) is ONE large XML file. Spark's native XML source
reads a file as one input split — one task no matter how big — so the
huge-single-file shape loses all parallelism on the default path. This
rung measures that cliff and the escape hatch on the SAME bytes:

  A. native XML source, 1 file           (the cliff: 1 task)
  B. read_xml_split, 1 file              (text-source lineSep split)
  C. native XML source, same bytes/100 files (the well-trodden path)

All three run parse → full-column materialization (noop sink), min of
``--trials``. The fixture reuses bench_xml_etl's record shape so the
bytes are comparable with the headline ETL corpus.

Usage: python tools/huge_xml_rung.py [--mb=512] [--trials=2] [--keep]
Prints one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_xml_etl import _record  # noqa: E402  (same record shape)

WORK = "/tmp/huge_xml_rung"


def generate(target_mb: int) -> tuple[str, str, int, float]:
    """One huge file + the same records split across 100 files."""
    one = os.path.join(WORK, "one")
    many = os.path.join(WORK, "many")
    os.makedirs(one, exist_ok=True)
    os.makedirs(many, exist_ok=True)
    rec_bytes = len(_record(123456))
    n = int(target_mb * 1024 * 1024 / rec_bytes)
    per_file = n // 100
    n = per_file * 100
    big = os.path.join(one, "huge.xml")
    with open(big, "w") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n<orders>\n')
        for i in range(n):
            fh.write(_record(i))
        fh.write("</orders>\n")
    for f in range(100):
        with open(os.path.join(many, f"part_{f:03d}.xml"), "w") as fh:
            fh.write('<?xml version="1.0" encoding="UTF-8"?>\n<orders>\n')
            for i in range(f * per_file, (f + 1) * per_file):
                fh.write(_record(i))
            fh.write("</orders>\n")
    mb = os.path.getsize(big) / 1e6
    return big, many, n, mb


def main() -> int:
    target_mb = 512
    trials = 2
    for a in sys.argv[1:]:
        if a.startswith("--mb="):
            target_mb = int(a.split("=", 1)[1])
        if a.startswith("--trials="):
            trials = int(a.split("=", 1)[1])
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    big, many, n, mb = generate(target_mb)

    from xml_to_parquet_spark.session import get_spark, set_log_level
    from xml_to_parquet_spark.sources.xml_source import (
        read_xml_auto,
        read_xml_split,
    )

    spark = get_spark("huge_xml_rung")
    set_log_level(spark, "ERROR")

    def run(label, make_df):
        best = None
        parts = None
        rows = None
        for _ in range(trials):
            t0 = time.time()
            df = make_df()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            if parts is None:
                parts = df.rdd.getNumPartitions()
                rows = df.count()
        return {
            "sec": round(best, 2),
            "mb_per_s": round(mb / best, 1),
            "partitions": parts,
            "rows": rows,
        }

    res = {
        "metric": "huge_xml_rung",
        "mb": round(mb, 1),
        "records": n,
        "native_one_file": run(
            "A", lambda: read_xml_auto(spark, big, "order")
        ),
        "split_one_file": run(
            "B", lambda: read_xml_split(spark, big, "order")
        ),
        "native_100_files": run(
            "C",
            lambda: read_xml_auto(
                spark, os.path.join(many, "*.xml"), "order"
            ),
        ),
    }
    if "--keep" not in sys.argv:
        shutil.rmtree(WORK)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
