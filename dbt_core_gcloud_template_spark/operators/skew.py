"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handling (enabled in `session.py`) splits oversized
sort-merge partitions automatically — that's the first line of
defense.  Salting is the explicit fallback for the cases AQE can't
fix: a broadcast-ineligible dimension joined on a key where a handful
of values dominate (the classic power-law `user_id`/`null-bucket`
problem at 100 TB).

Mechanics: the fact side gets a deterministic salt in [0, n); the
dimension side is replicated n times (one row per salt value); the
join key becomes (key, salt), spreading each hot key over n shuffle
partitions.  Salt is derived from stable row content (xxhash64), NOT
rand(), so retries/recomputations of a task place rows identically —
nondeterministic salting breaks shuffle-retry correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Join ``facts`` to ``dim`` on ``on`` with an n-way salt on the key.

    ``salt_from``: fact columns to derive the salt from (defaults to
    every fact column — any stable subset works; more entropy spreads
    hot keys more evenly).  The dimension is exploded ``n_salts``× —
    use only when dim is far smaller than the fact skew it fixes.

    Output: fact columns + dim columns (as a plain join would give).

    Only ``inner`` and ``left``/``left_outer`` are supported: the dim
    side is replicated ``n_salts``×, so right/full joins would emit
    each UNMATCHED dim row once per salt (duplicate output rows).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the exploded dim side duplicates unmatched rows under "
            "right/full joins"
        )
    cols = salt_from or facts.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    f = facts.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(d, [on, "_salt"], how)
    return joined.drop("_salt")


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 5,
) -> DataFrame:
    """Shuffle-key skew diagnostic: one row summarizing how unevenly a
    prospective join/groupBy key distributes — run this BEFORE a big
    shuffle to decide between a plain join, AQE skew handling, or
    :func:`salted_join`.

    Metrics: n_rows, n_keys, max/mean frequency ratio (a perfectly
    uniform key profiles at 1.0; a hot key at 10^4 means one reducer
    gets 10^4× the average), and the row share of the top-N keys.
    All ratios derive from exact integer counts (engine-deterministic).

    Plan: one partial-aggregated count per key, then a single-row
    summary — the profile costs one shuffle of key-count rows, far
    cheaper than discovering the skew mid-join.
    """
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    # Top-N share via TakeOrdered (per-partition top-N, driver merge) —
    # bounded memory at ANY key cardinality.  The earlier collect_list
    # formulation materialized every per-key count inside one reducer,
    # which OOMs exactly where this diagnostic matters (billions of
    # keys before a 100 TB shuffle).  Costs one extra pass over df —
    # partial-aggregated, still far cheaper than discovering skew
    # mid-join.
    topn_sum = (
        counts.orderBy(F.col("c").desc())
        .limit(top_n)
        .agg(F.sum("c").cast("bigint").alias("_tn"))
    )
    summary = counts.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_freq"),
        F.round(
            F.max("c") / (F.sum("c") / F.count("*")), 6
        ).alias("skew_ratio"),
    )
    return summary.crossJoin(topn_sum).select(
        "n_rows",
        "n_keys",
        "max_freq",
        "skew_ratio",
        F.round(F.col("_tn") / F.col("n_rows"), 6).alias(f"top{top_n}_share"),
    )
