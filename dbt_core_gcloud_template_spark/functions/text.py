"""Portable text primitives: tokenization shared with the DuckDB oracle.

Tokenization rule (frozen — the oracle embeds the same semantics):
  lowercase → split on runs of whitespace → drop empty tokens.

Spark : filter(split(lower(text), '\\\\s+'), t -> t != '')
DuckDB: list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')

Everything built on top (token counts, stopword ratios, shingles,
language ID) inherits portability from this single definition.  All
expressions are JVM built-ins — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_expr(col: Column) -> Column:
    """Array of lowercase whitespace tokens, empties removed (Spark)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def tokens_sql(expr: str) -> str:
    """Same token array for the DuckDB oracle."""
    return f"list_filter(string_split_regex(lower({expr}), '\\s+'), t -> t != '')"


def shingles_expr(tok: Column, k: int) -> Column:
    """Distinct k-word shingles joined by single spaces (Spark).

    transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(tokens, i, k)))
    stays inside codegen; array_distinct collapses repeats so Jaccard is
    over shingle SETS.

    Documents with fewer than k tokens yield an EMPTY array: Spark's
    sequence(1, 0) is the descending [1, 0] (not empty), and slice(tok,
    0, k) throws INVALID_PARAMETER_VALUE.START — so the whole expression
    is gated behind n >= k (CaseWhen branches evaluate lazily per row).
    """
    n = F.size(tok)
    seq = F.sequence(F.lit(1), n - F.lit(k - 1))
    sh = F.transform(seq, lambda i: F.concat_ws(" ", F.slice(tok, i, k)))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(tok_expr: str, k: int) -> str:
    """Same distinct k-shingles for the DuckDB oracle.

    DuckDB list slicing tok[i:j] is inclusive of both ends.
    """
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({tok_expr}) - {k - 1}, 0)), "
        f"i -> array_to_string(({tok_expr})[i:i+{k - 1}], ' ')))"
    )


# Frozen stopword lists for the n-gram language-ID heuristic.  Small on
# purpose: the point is the operator shape (per-language evidence scores →
# argmax), not lexicographic coverage.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
    "es": ["el", "la", "y", "los", "de", "es", "un", "una", "del", "por"],
}


# Frozen category blocklists for the safety/keyword filter (C4-style
# "bad words" filtering).  Tiny on purpose — the operator shape is a
# category → term-set map scored per document; a deployment swaps in
# its real lists (the C4 list is thousands of terms) without touching
# the operator.  Terms here are drawn from the synthetic corpus's
# vocabulary so the fixture exercises real hits.
BLOCKLISTS: dict[str, list[str]] = {
    "speed": ["slow", "fast"],
    "size": ["big", "small"],
    "engine": ["spark", "duck"],
}
