"""ANN retrieval-quality harness: recall@k of IVF-PQ ADC vs exact brute
force (VERDICT r6 #6).

The catalog's bit-exact oracles (a44/q47/q27) prove the PLAN is computed
correctly, but a config regression (too few probes, too small a rerank
shortlist) would still pass them — the replayed model would just be a
worse model. This harness measures what the oracles can't: retrieval
quality. Ground truth is the exact integer squared-L2 top-k over the same
quantized vectors the operator re-ranks with (numpy, driver-side — the
corpus fits; at 100 TB you'd sample queries the same way and brute-force
only their rows), excluding self, ties broken by smaller id — the
operator's own conventions, so recall@k = 1.0 is achievable.

Usage:
    python tools/ann_recall.py [--sf-dir=/tmp/soak_sf1] [--k=10]
Prints one table row per (n_probe, rerank) config and a final JSON line.
Defaults to the 20k-embedding soak rung (generate with
``python tools/soak_scale.py --rung=sf1 --gen-only``); falls back to
sf0.1 (2k embeddings) if the soak dir is absent.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def ground_truth(
    ids: np.ndarray, vq: np.ndarray, query_ids: list[int], k: int
) -> dict[int, list[int]]:
    """Exact top-k by (int squared-L2 asc, id asc), self excluded."""
    pos = {int(i): p for p, i in enumerate(ids)}
    out: dict[int, list[int]] = {}
    for q in query_ids:
        d = ((vq - vq[pos[q]]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))  # d asc, id asc
        top = [int(ids[j]) for j in order if int(ids[j]) != q][:k]
        out[q] = top
    return out


def main() -> None:
    sf_dir = "/tmp/soak_sf1"
    k = 10
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        sf_dir = "/root/testdata/sf0.1"

    import pyarrow.parquet as pq

    from xml_to_parquet_spark.functions.similarity import (
        HYPERPLANE_QUANT,
        ivf_pq_adc_topk,
    )
    from xml_to_parquet_spark.session import get_spark

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    # the operator's exact quantization: floor(v*quant + 0.5) as int64
    vq = np.floor(emb * float(HYPERPLANE_QUANT) + 0.5).astype(np.int64)

    # deterministic query sample: 16 evenly spaced ids beyond the model
    # seed range (ids < max(n_centroids, pq_k) seed the codebooks)
    cand = np.sort(ids[ids >= 16])
    query_ids = [int(x) for x in cand[:: max(1, len(cand) // 16)][:16]]

    gt = ground_truth(ids, vq, query_ids, k)

    spark = get_spark("ann_recall")
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    df = df.cache()
    df.count()

    grid = [
        (n_probe, rerank)
        for n_probe in (1, 2, 4, 8)
        for rerank in (20, 50, 200)
    ]
    rows = []
    print(f"corpus={len(ids)} queries={len(query_ids)} k={k} dir={sf_dir}")
    print(f"{'n_probe':>8} {'rerank':>7} {'recall@k':>9} {'sec':>6}")
    for n_probe, rerank in grid:
        t0 = time.time()
        got = (
            ivf_pq_adc_topk(
                df, query_ids, k=k, n_probe=n_probe, rerank=rerank
            )
            .collect()
        )
        sec = time.time() - t0
        by_q: dict[int, set[int]] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), set()).add(
                int(r["neighbor_id"])
            )
        recall = sum(
            len(by_q.get(q, set()) & set(gt[q])) / float(k)
            for q in query_ids
        ) / len(query_ids)
        rows.append(
            {
                "n_probe": n_probe,
                "rerank": rerank,
                "recall_at_k": round(recall, 4),
                "sec": round(sec, 2),
            }
        )
        print(f"{n_probe:>8} {rerank:>7} {recall:>9.4f} {sec:>6.2f}")
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "corpus": int(len(ids)),
                "k": k,
                "n_queries": len(query_ids),
                "grid": rows,
            }
        )
    )


def semdedup_recall() -> None:
    """Pair-recall of semantic_dedup's k-means cells vs exact all-pairs
    cosine (r8, VERDICT r7 #6 — SemDeDup's known failure mode is
    near-dup pairs straddling cell boundaries, which the bit-exact
    oracle cannot see because the oracle replays the same cells).

    Ground truth: ALL pairs with int64-exact cos >= tau over the same
    quantized vectors the operator uses (numpy, driver-side — sampling
    territory at 100 TB). Reported per k:
      pair_recall  = fraction of true near-dup pairs landing in ONE cell
      drop_recall  = fraction of the exact keep-min-id drop set that
                     semantic_dedup(k) also drops (the end metric)
      drops        = operator drop count (exact all-pairs = upper bound)
    """
    sf_dir = "/root/testdata/sf0.1"
    ks = (1, 2, 4, 8, 16, 32)
    probes = (1,)
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--ks="):
            ks = tuple(int(x) for x in a.split("=", 1)[1].split(","))
        elif a.startswith("--probes="):
            probes = tuple(int(x) for x in a.split("=", 1)[1].split(","))
    import pyarrow.parquet as pq

    from xml_to_parquet_spark.functions.similarity import semantic_dedup
    from xml_to_parquet_spark.session import get_spark

    quant, t_num, t_den = 1024, 2, 5
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]
    V = np.floor(emb * float(quant) + 0.5).astype(np.int64)
    G = V @ V.T
    nn = np.diagonal(G).copy()
    ok = (
        (G > 0)
        & (nn[:, None] > 0)
        & (nn[None, :] > 0)
        & (G * G * (t_den * t_den) >= (t_num * t_num) * nn[:, None] * nn[None, :])
    )
    iu = np.triu_indices(len(ids), 1)
    mask = ok[iu]
    true_pairs = list(zip(ids[iu[0][mask]], ids[iu[1][mask]]))
    # exact keep-min-id drop set: j drops iff any i<j qualifies
    tri = np.triu(ok, 1)
    drop_true = {int(ids[j]) for j in range(len(ids)) if tri[:, j].any()}
    print(
        f"corpus={len(ids)} true_pairs={len(true_pairs)} "
        f"exact_drops={len(drop_true)} dir={sf_dir}"
    )
    spark = get_spark("semdedup_recall")
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    df = df.cache()
    df.count()
    print(f"{'k':>4} {'probe':>5} {'pair_recall':>12} {'drop_recall':>12} "
          f"{'drops':>6} {'sec':>6}")
    rows = []
    for k, n_probe in ((k, p) for k in ks for p in probes):
        from xml_to_parquet_spark.functions.similarity import (
            kmeans_probe_quantized,
        )

        t0 = time.time()
        out = semantic_dedup(
            df, k=k, iterations=2, quant=quant, n_probe=n_probe
        ).collect()
        sec = time.time() - t0
        drops = {int(r["vec_id"]) for r in out if not r["keep"]}
        if n_probe == 1:
            cell1 = {int(r["vec_id"]): {r["cell"]} for r in out}
        else:
            cell1 = {}
            for r in kmeans_probe_quantized(
                df, k=k, iterations=2, n_probe=n_probe, quant=quant
            ).collect():
                cell1.setdefault(int(r["vec_id"]), set()).add(r["cell"])
        pr = (
            sum(
                1
                for i, j in true_pairs
                if cell1[int(i)] & cell1[int(j)]
            )
            / len(true_pairs)
            if true_pairs
            else 1.0
        )
        dr = (
            len(drops & drop_true) / len(drop_true) if drop_true else 1.0
        )
        rows.append(
            {"k": k, "n_probe": n_probe, "pair_recall": round(pr, 4),
             "drop_recall": round(dr, 4), "drops": len(drops),
             "sec": round(sec, 2)}
        )
        print(f"{k:>4} {n_probe:>5} {pr:>12.4f} {dr:>12.4f} "
              f"{len(drops):>6} {sec:>6.2f}")
        # the operator never drops a row the exact pass keeps: within-cell
        # pairs are a subset of all pairs, keep-min-id is monotone
        assert drops <= drop_true, "false drop — operator bug"
    print(json.dumps({"sf_dir": sf_dir, "corpus": int(len(ids)),
                      "true_pairs": len(true_pairs),
                      "exact_drops": len(drop_true), "grid": rows}))


if __name__ == "__main__":
    if "--semdedup" in sys.argv:
        semdedup_recall()
    else:
        main()
