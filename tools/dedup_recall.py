"""LSH candidate recall vs exact Jaccard ground truth (r7, the
dedup-side twin of tools/ann_recall.py).

The bit-exact oracle proves the banding join computes exactly what the
documented algorithm says — it can NOT tell whether the band/row
parameters are any good at finding real near-duplicates. This harness
measures that: exact n-gram-Jaccard pairs (inverted-index self-join,
dedup.ngram_jaccard_pairs — no sampling, no sketch) are the ground
truth; MinHash-LSH candidates at several band configs are scored by

  recall(τ)    = |cand ∩ truth_τ| / |truth_τ|
  efficiency   = |cand ∩ truth_τ| / |cand|   (how much verify work is wasted)

Theory says a (b bands, r rows/band) config fires on a pair with
Jaccard j with probability 1 − (1 − j^r)^b — recall should track that
S-curve; a regression in the shingle/minhash pipeline that the oracle
can't see (e.g. a permutation-constant bug that leaves signatures valid
but degenerate) shows up here as a recall collapse.

Usage: python tools/dedup_recall.py [--sf=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.1"
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF = a.split("=", 1)[1]

THRESHOLDS = [0.5, 0.7, 0.8]
BAND_CONFIGS = [2, 4, 8]  # rows/band = 16 // bands


def main() -> int:
    from xml_to_parquet_spark.functions.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from xml_to_parquet_spark.session import get_spark

    spark = get_spark("dedup_recall")
    from xml_to_parquet_spark.session import set_log_level

    set_log_level(spark, "ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # exact ground truth once, at the loosest threshold; tighter ones
    # are filters over it
    truth_all = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, threshold=min(THRESHOLDS)
        ).collect()
    }
    results = []
    for bands in BAND_CONFIGS:
        cand = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(docs, bands=bands).collect()
        }
        row = {"bands": bands, "rows_per_band": 16 // bands,
               "n_candidates": len(cand)}
        for tau in THRESHOLDS:
            truth = {p for p, j in truth_all.items() if j >= tau}
            hit = len(cand & truth)
            row[f"recall@{tau}"] = round(hit / len(truth), 3) if truth else None
            row[f"n_truth@{tau}"] = len(truth)
        row["efficiency@0.5"] = (
            round(len(cand & set(truth_all)) / len(cand), 3) if cand else None
        )
        results.append(row)
        print(row, flush=True)
    print(json.dumps({"sf": SF, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
