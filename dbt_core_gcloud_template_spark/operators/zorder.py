"""Z-order (Morton) clustering for multi-column data skipping.

Lexicographic `sortWithinPartitions(a, b)` clusters perfectly on `a`
but scatters `b`; parquet min/max skipping then only helps filters on
`a`.  Interleaving the bits of both columns' ranks gives locality on
EVERY clustered column at once — the same trick behind Delta's
`OPTIMIZE ... ZORDER BY` and BigQuery multi-column clustering.

Columns are quantized to ``bits``-bit ranks by uniform min/max
scaling — one tiny aggregate for the bounds, never a global sort or
window (a global `percent_rank` would serialize the whole table
through one partition).  Quantization only drives layout, not
results, so uniform scaling is safe even on skewed data — skew costs
some skipping efficiency, not correctness.  Z-ordering belongs in
periodic OPTIMIZE-style layout jobs, not on every incremental write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton-interleave `bits`-wide integer ranks, MSB first."""
    z = F.lit(0).cast("bigint")
    n = len(ranks)
    for bit in range(bits - 1, -1, -1):
        for i, r in enumerate(ranks):
            out_pos = bit * n + (n - 1 - i)
            bit_val = F.shiftright(r, bit).bitwiseAND(F.lit(1))
            z = z + bit_val.cast("bigint") * F.lit(1 << out_pos)
    return z


def z_value(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Append a ``_z`` Morton code over numeric/temporal ``cols``, each
    quantized to ``bits`` bits by uniform min/max scaling."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    max_val = (1 << bits) - 1
    if any(bounds[f"_min_{c}"] is None or bounds[f"_max_{c}"] is None for c in cols):
        # Empty input (or an all-NULL column): min/max aggregate to NULL
        # and there is nothing to order — an OPTIMIZE job over an empty
        # partition must be a no-op, not a crash.
        return df.withColumn("_z", F.lit(0).cast("bigint"))
    ranks = []
    for c in cols:
        lo, hi = bounds[f"_min_{c}"], bounds[f"_max_{c}"]
        span = (hi - lo) or 1.0
        r = F.least(
            F.lit(max_val).cast("bigint"),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * max_val)
            .cast("bigint"),
        )
        ranks.append(F.greatest(F.lit(0).cast("bigint"), r))
    return df.withColumn("_z", _interleave(ranks, bits))


def zorder_sort(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Sort within partitions by the Morton code over ``cols`` — the
    layout step of an OPTIMIZE-style job (write the result with the
    normal table sink)."""
    return z_value(df, cols, bits).sortWithinPartitions("_z").drop("_z")
