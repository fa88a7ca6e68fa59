"""BPE tokenizer induction over a corpus (training-data pipeline).

Byte-pair encoding as in Sennrich et al. 2016 (arXiv:1508.07909): learn
the top-N symbol merges from word-type frequencies, then segment text
with the learned merge table.

Scale shape — the same split every production BPE trainer uses:

1. **Type aggregation is distributed**: one corpus shuffle reduces the
   token stream to (word type, frequency) — the only pass whose cost
   scales with corpus size.  The type table is then capped to the
   ``max_types`` most frequent types via TakeOrdered (bounded driver
   memory, deterministic (freq desc, word) order).
2. **The merge loop is driver-side on the type dict** — pair counts
   over word TYPES weighted by frequency, exactly the reference
   algorithm.  The loop never touches the corpus again; its cost is
   O(n_merges · types), independent of corpus size.
3. **Application is Arrow-batched** (`mapInPandas`) with the merge
   ranks broadcast and a per-batch word→segmentation memo — each
   distinct word segments once per batch, the classic dictionary-apply
   pattern.

Determinism: merge selection breaks frequency ties lexicographically on
the pair; no RNG anywhere, so the learned table is identical across
runs, partitionings, and engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources.registry import ensure_parallelism

_EOW = "</w>"  # end-of-word marker, per the reference algorithm


def word_type_freqs(
    df: DataFrame, text_col: str, max_types: int = 100_000
) -> list[tuple[str, int]]:
    """ONE corpus pass: (word type, frequency), capped to the
    ``max_types`` most frequent (TakeOrdered — no global sort)."""
    tok = tokens_expr(F.col(text_col))
    rows = (
        ensure_parallelism(df)
        .select(F.explode(tok).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_types)
        .collect()
    )
    return [(r.w, r.c) for r in rows]


def learn_merges(
    type_freqs: list[tuple[str, int]],
    n_merges: int = 50,
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Driver-side BPE merge learning over the type dict (reference
    algorithm; cost independent of corpus size).

    Returns [(left, right, pair_freq), ...] in merge order.  Ties in
    pair frequency break lexicographically on (left, right).
    """
    vocab = {tuple(list(w) + [_EOW]): c for w, c in type_freqs}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, c in vocab.items():
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        if freq < min_freq:
            break
        merges.append((left, right, freq))
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == left
                    and symbols[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    min_freq: int = 2,
    max_types: int = 100_000,
) -> list[tuple[str, str, int]]:
    """Corpus → learned merge table (see module docstring for the
    distributed/driver split)."""
    return learn_merges(
        word_type_freqs(df, text_col, max_types=max_types),
        n_merges=n_merges,
        min_freq=min_freq,
    )


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, best-rank-first (the standard
    BPE inference order — identical output to replaying merges in
    training order)."""
    symbols = list(word) + [_EOW]
    while len(symbols) > 1:
        best_i, best_rank = -1, None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """Arrow-batched BPE ENCODING: per doc, the full segmented token
    stream (doc-order), plus word/token counts.  This is the actual
    tokenizer-apply step a training pipeline feeds into sequence
    packing — where :func:`bpe_segment_docs` keeps only counts, this
    keeps the tokens.  The merge table broadcasts via closure; a
    per-batch word→segmentation memo makes each distinct word segment
    once per batch (the classic dictionary-apply pattern).

    Output: <id_col>, n_words, n_bpe_tokens, bpe_tokens
    (array<string>, ``</w>``-terminated per word as learned).
    Map-only — zero shuffles at any corpus size; downstream consumers
    (packing, counting) impose their own partitioning.
    """
    ranks = {(l, r): i for i, (l, r, _f) in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def encode(text: str) -> tuple[int, list[str]]:
            words = [w for w in (text or "").lower().split() if w]
            toks: list[str] = []
            for w in words:
                seg = memo.get(w)
                if seg is None:
                    seg = segment_word(w, ranks)
                    memo[w] = seg
                toks.extend(seg)
            return len(words), toks

        for pdf in it:
            enc = [encode(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": [e[0] for e in enc],
                    "n_bpe_tokens": [len(e[1]) for e in enc],
                    "bpe_tokens": [e[1] for e in enc],
                }
            )

    return (
        ensure_parallelism(df.select(id_col, text_col))
        .mapInPandas(
            batches,
            f"{id_col} bigint, n_words int, n_bpe_tokens int, "
            "bpe_tokens array<string>",
        )
        .filter(F.col("n_words") > 0)
    )


def bpe_segment_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """Arrow-batched BPE segmentation: per doc, the BPE token count,
    word count, and fertility (BPE tokens per word — the tokenizer-
    quality number).  The merge table broadcasts via closure; a
    per-batch word→len memo makes each distinct word segment once.

    Output: <id_col>, n_words, n_bpe_tokens, fertility (6dp).
    """
    ranks = {(l, r): i for i, (l, r, _f) in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def doc_counts(text: str) -> tuple[int, int]:
            # NULL text arrives as None through Arrow; an empty doc has
            # 0 words and is dropped by the n_words > 0 filter below.
            words = [w for w in (text or "").lower().split() if w]
            total = 0
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(segment_word(w, ranks))
                    memo[w] = n
                total += n
            return len(words), total

        for pdf in it:
            counts = [doc_counts(t) for t in pdf[text_col]]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": [c[0] for c in counts],
                    "n_bpe_tokens": [c[1] for c in counts],
                }
            )
            yield out

    seg = df.select(id_col, text_col).mapInPandas(
        batches, f"{id_col} bigint, n_words int, n_bpe_tokens int"
    )
    return seg.filter(F.col("n_words") > 0).select(
        id_col,
        "n_words",
        "n_bpe_tokens",
        F.round(
            F.col("n_bpe_tokens").cast("double") / F.col("n_words"), 6
        ).alias("fertility"),
    )
