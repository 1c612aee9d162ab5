#!/usr/bin/env python
"""Operator-minus-fixture scale rung (VERDICT r10 item 5).

The two slowest catalog entries are dominated by FIXTURE construction,
not operator cost: q40/a60 audio-fp dedup spends its seconds building
260-sample WAV clips JVM-side, and q139 simhash-blocked spends them
tokenizing + signing 5k documents. Their catalog seconds must not be
read as the pair-search operator's cost — this rung isolates it.

Method: build each entry's SIGNATURE table through the real pipeline
(text: dedup.simhash over the documents table; audio: WAV construction
+ wave-module decode + Arrow fingerprint kernel), PERSIST it to parquet
(untimed), then time only the pigeonhole blocked-pair stage
(dedup.simhash_blocked_pairs → count) reading the persisted table at 1×
(sf0.1, 5k docs) and 100× (soak docs100, 500k docs). Output: wall
seconds per rung + the scaling exponent log100(t_big/t_small)
(1.0 = linear in rows).

Requires the docs100 soak dir (tools/soak_scale.py --rung=docs100
--gen-only builds /tmp/soak_docs100). Results recorded in SCALING.md
"Operator-minus-fixture rung".

Usage: python tools/operator_rung.py [--which=text|audio|both]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMALL = os.environ.get("SOAK_SRC", "/root/testdata/sf0.1")
BIG = "/tmp/soak_docs100"
WORK = "/tmp/operator_rung"


def _build_text_sigs(spark, sf_dir: str, out: str) -> None:
    from xml_to_parquet_spark.catalog import load_table
    from xml_to_parquet_spark.functions.dedup import simhash

    docs = load_table(spark, sf_dir, "documents")
    # write with the session's parallelism: a 5k-row signature df
    # collapses to 1 file otherwise and the timed join would run on a
    # single task — not the layout any real signature table has
    simhash(docs).repartition(32).write.mode("overwrite").parquet(out)


def _build_audio_sigs(spark, sf_dir: str, out: str) -> None:
    """Real pipeline: WAV clips built from doc ids (the fixture),
    decoded by the stdlib wave module and fingerprinted by the Arrow
    kernel — everything UP TO the signature table, which is the part
    this rung excludes from timing."""
    # reuse the catalog entry's own construction up to the signature
    # via its module-level helpers
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.catalog import load_table
    from xml_to_parquet_spark.functions.multimodal import (
        audio_fingerprint_batch,
        pcm16_wav_expr,
    )
    from xml_to_parquet_spark.session import _ship_package
    from xml_to_parquet_spark.workload import (
        _envelope_bits_expr,
        _prefix_doubling,
    )

    _ship_package(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = docs.withColumn("bits", _envelope_bits_expr("aud", flip_mod=1))
    d, prefix_col = _prefix_doubling(d, "bits")
    amps = F.transform(
        F.sequence(F.lit(0), F.lit(64)),
        lambda f: F.when(f == 0, F.lit(100).cast("long")).otherwise(
            F.lit(100)
            + 2
            * F.coalesce(
                F.try_element_at(
                    F.col(prefix_col), F.least(f, F.lit(63)).cast("int")
                ),
                F.lit(0).cast("long"),
            )
            - f
        ),
    )
    samples = F.flatten(
        F.transform(amps, lambda a: F.array_repeat(a.cast("int"), 4))
    )
    clips = d.select(
        F.col("doc_id").alias("id"), samples.alias("samples")
    ).select(
        "id", pcm16_wav_expr("samples", sample_rate=8000).alias("payload")
    )
    sig = audio_fingerprint_batch(clips).select(
        F.col("id").alias("doc_id"), F.col("afp").alias("simhash")
    )
    sig.repartition(32).write.mode("overwrite").parquet(out)


def _time_pairs(
    spark, sig_path: str, bits: int, reps: int = 3
) -> tuple[float, int]:
    from xml_to_parquet_spark.functions.dedup import simhash_blocked_pairs

    best = math.inf
    for _ in range(reps):
        sig = spark.read.parquet(sig_path)
        t0 = time.time()
        n = simhash_blocked_pairs(sig, max_hamming=3, bits=bits).count()
        best = min(best, time.time() - t0)
    return best, n


def _time_containment(spark, sf_dir: str, reps: int = 2) -> tuple[float, int]:
    """Full containment join (shingle + prefix + postings join + verify)
    over the documents table — unlike the signature rungs there is no
    fixture to exclude: shingling IS the operator's stage 1. docs100's
    per-replica token suffixes keep replicas containment-independent, so
    pair structure scales ~linearly in docs (r12)."""
    from xml_to_parquet_spark.catalog import load_table
    from xml_to_parquet_spark.functions.dedup import containment_prefix_pairs

    best = math.inf
    n = 0
    for _ in range(reps):
        docs = load_table(spark, sf_dir, "documents")
        t0 = time.time()
        n = containment_prefix_pairs(docs, t_num=4, t_den=5).count()
        best = min(best, time.time() - t0)
    return best, n


def main() -> int:
    which = "both"
    for a in sys.argv[1:]:
        if a.startswith("--which="):
            which = a.split("=", 1)[1]
    if not os.path.exists(os.path.join(BIG, "documents.parquet")):
        raise SystemExit(
            f"missing {BIG}: run tools/soak_scale.py --rung=docs100 "
            f"--gen-only first"
        )
    from xml_to_parquet_spark.session import get_spark

    spark = get_spark("operator_rung")
    os.makedirs(WORK, exist_ok=True)
    out = {}
    jobs = []
    if which in ("text", "both"):
        jobs.append(("simhash_text", _build_text_sigs, 32))
    if which in ("audio", "both"):
        jobs.append(("audio_fp", _build_audio_sigs, 64))
    for name, build, bits in jobs:
        small_p = os.path.join(WORK, f"{name}_small")
        big_p = os.path.join(WORK, f"{name}_big")
        build(spark, SMALL, small_p)  # untimed fixture+signature
        build(spark, BIG, big_p)
        t_small, n_small = _time_pairs(spark, small_p, bits)
        t_big, n_big = _time_pairs(spark, big_p, bits)
        out[name] = {
            "pair_stage_sec_1x": round(t_small, 3),
            "pair_stage_sec_100x": round(t_big, 3),
            "pairs_1x": n_small,
            "pairs_100x": n_big,
            "exponent_per_decade": round(
                math.log10(t_big / t_small) / 2, 3
            ),
        }
        print(json.dumps({name: out[name]}))
    if which in ("containment", "both"):
        t_small, n_small = _time_containment(spark, SMALL)
        t_big, n_big = _time_containment(spark, BIG)
        out["containment"] = {
            "sec_1x": round(t_small, 3),
            "sec_100x": round(t_big, 3),
            "pairs_1x": n_small,
            "pairs_100x": n_big,
            "exponent_per_decade": round(
                math.log10(t_big / t_small) / 2, 3
            ),
        }
        print(json.dumps({"containment": out["containment"]}))
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
