"""Bloom-filter semi-join reduction — shrink the fact side BEFORE the
shuffle when the dimension is too big to broadcast.

The 100 TB join-pruning ladder:

1. dim fits in executor memory        → ``F.broadcast(dim)`` (free).
2. dim too big, but its KEY SET fits
   a few hundred KB of bloom bits     → THIS operator: build a bloom
   filter over the dim keys (one tiny aggregate), broadcast the bitmap,
   and drop non-matching fact rows at the scan — the shuffle then moves
   only (matches + false positives) instead of the whole fact table.
3. neither fits                       → plain shuffle join + AQE.

Spark's optimizer injects runtime bloom filters itself in some shapes
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only for
selective filters it can see through; this operator makes the reduction
explicit and composable.  ``bloom_filter_agg`` / ``might_contain`` are
not public SQL functions (Spark keeps them optimizer-internal), so the
filter is built from public primitives:

- k positions per key: ``pmod(xxhash64(key, seed_i), m)``;
- the m-bit bitmap as ``m/64`` longs via ``bit_or`` of
  ``shiftleft(1L, pos % 64)`` grouped by word index — a
  map-side-combined aggregate whose result is at most ``m/64`` rows;
- the dense word array rides to every task as a one-row broadcast;
  the probe is a JVM ``forall`` lambda over the k positions
  (no Python in the hot path).

False positives are removed by the exact join that follows, so results
are bit-exact with the plain join — the bloom pass only changes how
many fact rows reach the shuffle.  False-positive rate ≈
(1 - e^(-k·n/m))^k; the default m = 2^20 bits / k = 5 holds ~100k keys
at <1% FP.  Size m at ~10 bits per expected distinct key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BloomBitmap",
    "bloom_filter_words",
    "bloom_filter_bitmap",
    "bloom_prefilter",
    "bloom_semi_join",
    "update_bloom_bitmap",
]


@dataclass(frozen=True)
class BloomBitmap:
    """A bloom bitmap PLUS the parameters it was built with.

    A bare ``words`` list is only safe to probe with the exact
    ``(n_bits, k)`` pair that built it: same ``n_bits`` with a
    different ``k`` passes the length check but yields FALSE
    NEGATIVES (a key inserted with 5 positions probed with 7 misses
    on the 2 extra ones), silently breaking the no-false-negative
    guarantee every caller relies on.  Persist THIS struct as the
    stored artifact — consumers then probe with the matching params
    by construction instead of by convention.
    """

    words: tuple[int, ...]
    n_bits: int
    k: int

    def __post_init__(self):
        if self.n_bits % 64:
            raise ValueError("n_bits must be a multiple of 64")
        if len(self.words) != self.n_bits // 64:
            raise ValueError(
                f"bitmap has {len(self.words)} words; n_bits={self.n_bits} "
                f"needs {self.n_bits // 64}"
            )
        if self.k < 1:
            raise ValueError("k must be >= 1")


def _positions_sql(key_expr: str, n_bits: int, k: int) -> str:
    """SQL array of the k bloom bit-positions for a key expression."""
    hashes = ", ".join(
        f"pmod(xxhash64({key_expr}, {seed}), {n_bits}L)" for seed in range(k)
    )
    return f"array({hashes})"


def bloom_filter_words(
    dim: DataFrame, key_col: str, n_bits: int = 1 << 20, k: int = 5
) -> list[int]:
    """Aggregate the dim keys into a dense bloom bitmap (``n_bits/64``
    longs, collected to the driver — ~128 KB at the default m)."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    pos = F.explode(F.expr(_positions_sql(key_col, n_bits, k))).alias("p")
    sparse = (
        dim.select(pos)
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in sparse:
        words[r["w"]] = r["bits"]
    return words


def bloom_filter_bitmap(
    dim: DataFrame, key_col: str, n_bits: int = 1 << 20, k: int = 5
) -> BloomBitmap:
    """Like :func:`bloom_filter_words` but returns the parameter-carrying
    :class:`BloomBitmap` — the form to PERSIST as a stored artifact."""
    return BloomBitmap(
        tuple(bloom_filter_words(dim, key_col, n_bits=n_bits, k=k)), n_bits, k
    )


def update_bloom_bitmap(
    bitmap: BloomBitmap, new_keys: DataFrame, key_col: str
) -> BloomBitmap:
    """Day-N maintenance for the stored bloom artifact: OR the accepted
    batch's keys into the bitmap — one BATCH-sized aggregate plus a
    driver-side word-wise OR (``n_bits/64`` longs), never an index
    pass.  Bloom bitmaps are append-only monotone, so the invariant
    ``update(bitmap(day1), day2) == bitmap(day1 ∪ day2)`` is exact —
    the refreshed artifact keeps the no-false-negative guarantee for
    everything ever inserted.  The (n_bits, k) pair rides along
    unchanged, so a probe can never mismatch the bits."""
    delta = bloom_filter_words(
        new_keys, key_col, n_bits=bitmap.n_bits, k=bitmap.k
    )
    return BloomBitmap(
        tuple(w | d for w, d in zip(bitmap.words, delta)),
        bitmap.n_bits,
        bitmap.k,
    )


def bloom_prefilter(
    facts: DataFrame,
    fact_key: str,
    words: list[int],
    n_bits: int,
    k: int,
    bitmap_col: str = "_bloom_bits",
    negate: bool = False,
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the bloom filter
    (``negate=True`` flips it: keep rows whose key is DEFINITELY
    absent — bloom filters have no false negatives, so the negated
    class needs no exact confirmation).

    NULL keys: membership of NULL is unknowable (``xxhash64`` skips
    null inputs, so every NULL key would otherwise collapse onto one
    arbitrary position set), so NULL-keyed rows are classified
    conservatively as "might be present": kept by the positive branch,
    dropped by the negated one.  The two branches therefore always
    partition the input exactly, and the exact join that follows the
    positive branch settles the NULL rows (for the dedup callers, a
    left-anti on a NULL key never matches, preserving the
    keep-NULL-groups semantics of the plain incremental path).

    The bitmap joins in as a one-row broadcast (a giant literal array
    would bloat the plan tree); the membership test is a ``forall``
    over the k hashed positions, entirely inside codegen.
    """
    spark = facts.sparkSession
    bitmap = spark.createDataFrame(
        [(list(words),)], f"{bitmap_col}: array<bigint>"
    )
    probe = F.expr(
        f"forall({_positions_sql(fact_key, n_bits, k)}, "
        f"p -> (element_at({bitmap_col}, cast(p div 64 as int) + 1) "
        f"& shiftleft(1L, cast(p % 64 as int))) != 0)"
    )
    key_null = F.expr(fact_key).isNull()
    if negate:
        probe = ~probe & ~key_null
    else:
        probe = probe | key_null
    return facts.crossJoin(F.broadcast(bitmap)).filter(probe).drop(bitmap_col)


def bloom_semi_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Exact ``facts ⋈ dim`` with a bloom pre-filter on the fact side.

    ``how`` is restricted to join types where dropping non-matching
    FACT rows early is semantics-preserving: inner / left_semi.  The
    final join removes bloom false positives, so output == plain join.
    """
    if how not in ("inner", "semi", "left_semi"):
        raise ValueError(
            f"bloom pre-filtering drops unmatched fact rows; only inner/"
            f"left_semi joins survive that, got {how!r}"
        )
    words = bloom_filter_words(dim, dim_key, n_bits, k)
    pruned = bloom_prefilter(facts, fact_key, words, n_bits, k)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
