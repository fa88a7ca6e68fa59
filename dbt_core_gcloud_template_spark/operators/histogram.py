"""Deterministic mergeable histogram sketch + quantile estimation.

The engine-deterministic alternative to t-digest/`approx_percentile`
for corpus-scale quantiles: fixed equi-width bins over a known [lo, hi)
range give EXACT integer counts — mergeable across partitions, shards,
days, or clusters by elementwise addition (the property t-digest buys
with approximation, bought here with a pre-declared range instead).
Quantile estimates interpolate linearly inside the selected bin, with
every double operation in a fixed order so Spark, the DuckDB oracle,
and any future engine agree bit-for-bit.

Accuracy: error ≤ bin width — for monitoring dashboards and curation
cut-offs on bounded metrics (prices, lengths, scores) that is exactly
the knob you want (n_bins trades memory for resolution: 2^10 bins =
8 KiB of state at any data scale).

At 100 TB: the bin aggregation is ONE map-side-combined shuffle of
(bin, partial_count) rows — n_bins distinct keys regardless of input
size; everything after runs on n_bins rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram_bins(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Equi-width bin counts over [lo, hi); values at/above ``hi`` clamp
    into the last bin, below ``lo`` into the first (sketch semantics:
    the range is declared, outliers saturate).  NULLs are excluded —
    without the filter, floor(NULL) is NULL and least/greatest skip
    NULL args, silently counting every NULL row into bin 0 (and into
    n_total, skewing quantile estimates).  Output: bin, c."""
    x = F.col(col).cast("double")
    width = (hi - lo) / n_bins
    b = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("int")
    b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    return (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def histogram_quantiles(
    bins: DataFrame, lo: float, hi: float, n_bins: int, qs: list[float]
) -> DataFrame:
    """Quantile estimates from a bin-count sketch.

    For each q: pos = q · n_total, select the first bin whose running
    cumulative count reaches pos, interpolate within it:
        est = lo + (bin + (pos - cum_before) / c) · width
    All arithmetic on n_bins-sized data (window + join over ≤ n_bins
    rows — the single-partition window warning does not matter at any
    input scale because the sketch IS n_bins rows).

    Output: q, n_total, est (6dp).
    """
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "c", F.sum("c").over(w).alias("cum")
    ).withColumn("n_total", F.sum("c").over(Window.partitionBy()))
    qdf = bins.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    pos = F.col("q") * F.col("n_total")
    hit = (
        cum.join(qdf)
        .filter(F.col("cum") >= pos)
        .groupBy("q")
        .agg(
            F.min(F.struct("bin", "c", "cum", "n_total")).alias("s"),
        )
    )
    frac = (
        F.col("q") * F.col("s.n_total") - (F.col("s.cum") - F.col("s.c"))
    ) / F.col("s.c")
    return hit.select(
        "q",
        F.col("s.n_total").cast("bigint").alias("n_total"),
        F.round(
            F.lit(float(lo)) + (F.col("s.bin") + frac) * F.lit(width), 6
        ).alias("est"),
    )
