#!/usr/bin/env python
"""Screen→exact containment rung: is the a204 composition actually
survivor-sized?

The claim (dedup.containment_screened_pairs docstring): on a corpus
where most docs are contained in nothing, the bottom-k sketch screen
turns the exact join's candidate volume from corpus-sized to
survivor-sized with identical verdicts. This rung measures it on a
corpus built to make the UNRESTRICTED exact join expensive:

- N container docs, each ``--phrases`` phrases drawn (id-hashed) from
  a pool of ``--pool`` five-word phrases — shared phrases give every
  shingle a document frequency of ~phrases·N/pool, so each doc's
  prefix joins a long postings list and the full exact join's
  candidate volume is Σ_A Σ_{w∈prefix(A)} df(w) ≈ N·prefix·df;
- P quoted docs, each the first 3 phrases of container i verbatim —
  trigram containment exactly 1.0, the only true pairs.

The screen nominates ~P contained-side docs, so the screened exact
join probes ~P prefixes instead of N+P. WHERE THE CROSSOVER IS: the
screen probes k hashes per doc, the exact join probes
prefix(A) ≈ (1−t)·|A|+1 rarest shingles per doc — on SHORT docs
(prefix < k) the screen costs MORE probe volume than the join it is
screening for and the composition is a net loss; on LONG docs
(prefix ≫ k) the screen's probe volume stays O(k) while the exact
join's grows linearly with doc length (plus its per-candidate verify
arrays), and the composition wins. Run both regimes:

  python tools/screen_rung.py --n=20000 --quoted=40            # short
  python tools/screen_rung.py --n=5000 --quoted=20 \\
      --phrases=160 --pool=5000                                # long

Reported: wall of full-exact vs screened (same code both sides of the
composition), survivor count, and pair-set equality. Results in
SCALING.md "Screen→exact containment rung".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/screen_rung"


def build_corpus(spark, n: int, quoted: int, out: str, phrases: int,
                 pool: int) -> None:
    from pyspark.sql import functions as F

    def phrase_text(n_phrases: int) -> str:
        # doc text = n_phrases phrases; phrase j of doc id is pool index
        # pmod(xxhash64(id, j), pool); phrase p = "p{p}w0 .. p{p}w4"
        return (
            f"array_join(transform(sequence(0, {n_phrases - 1}), "
            "j -> array_join(transform(sequence(0, 4), "
            f"w -> concat('p', pmod(xxhash64(id, j), {pool}), 'w', w)), "
            "' ')), ' ')"
        )

    def word_text(n_words: int) -> str:
        # every-trigram-common regime: flat word draws from a tiny pool
        # (pool^3 possible trigrams), so NO shingle is rare and the
        # exact join's rarest-prefix trick cannot shrink df
        return (
            f"array_join(transform(sequence(0, {n_words - 1}), "
            f"j -> concat('w', pmod(xxhash64(id, j), {pool}))), ' ')"
        )

    if phrases < 0:  # --words mode: |phrases| flat word draws per doc
        big, small = word_text(-phrases), word_text(15)
    else:
        big, small = phrase_text(phrases), phrase_text(3)
    containers = spark.range(n).select(
        F.col("id").alias("doc_id"), F.expr(big).alias("text")
    )
    step = max(n // quoted, 1)
    quotes = (
        spark.range(n)
        .filter(F.col("id") % step == 0)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.expr(small).alias("text"),  # same first words/phrases
        )
    )
    containers.unionByName(quotes).repartition(32).write.mode(
        "overwrite"
    ).parquet(out)


def main() -> int:
    n = 10_000
    quoted = 20
    phrases = 6
    pool = 500
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--quoted="):
            quoted = int(a.split("=", 1)[1])
        elif a.startswith("--phrases="):
            phrases = int(a.split("=", 1)[1])
        elif a.startswith("--pool="):
            pool = int(a.split("=", 1)[1])
    from xml_to_parquet_spark.functions.dedup import (
        containment_prefix_pairs,
        containment_screened_pairs,
        containment_sketch_pairs,
    )
    from xml_to_parquet_spark.session import get_spark

    spark = get_spark(app_name="screen_rung")
    corpus = os.path.join(WORK, f"corpus_{n}_{quoted}_{phrases}_{pool}")
    build_corpus(spark, n, quoted, corpus, phrases, pool)
    df = spark.read.parquet(corpus)

    t0 = time.monotonic()
    full = {
        (r.id_a, r.id_b)
        for r in containment_prefix_pairs(df, t_num=4, t_den=5).collect()
    }
    full_s = time.monotonic() - t0

    survivors = containment_sketch_pairs(
        df, k=16, t_num=1, t_den=2
    ).select("id_a").distinct().count()

    t0 = time.monotonic()
    comp = {
        (r.id_a, r.id_b)
        for r in containment_screened_pairs(
            df, k=16, t_num=4, t_den=5, screen_num=1, screen_den=2
        ).collect()
    }
    comp_s = time.monotonic() - t0

    n_docs = df.count()
    ok = comp == full and len(full) >= quoted
    print(
        json.dumps(
            {
                "rung": "containment_screen",
                "docs": n_docs,
                "phrases_per_doc": phrases,
                "phrase_pool": pool,
                "true_pairs": len(full),
                "screen_survivors": survivors,
                "survivor_fraction": round(survivors / n_docs, 4),
                "full_exact_wall_s": round(full_s, 2),
                "screened_wall_s": round(comp_s, 2),
                "speedup": round(full_s / max(comp_s, 1e-9), 2),
                "pair_sets_identical": comp == full,
            }
        )
    )
    shutil.rmtree(WORK, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
