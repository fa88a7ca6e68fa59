"""Temporal join operators: as-of join and interval range join.

Spark has no native AS OF join (SURVEY.md §2.3 notes the reference has
no joins at all — these are north-star operators for event/feature
pipelines: attribute a fact row to the most recent dimension state at
or before its timestamp).

Implementation is the scalable union+window idiom, NOT a range
cross-join: tag both sides, union them, and run ``last_value(...,
ignorenulls)`` over a per-key window ordered by time.  One shuffle on
the join key, state bounded by the window frame — survives 100 TB
where an inequality join (O(n·m) per key) would not.  The range join
keeps the inequality form deliberately: intervals are short and Spark
can use a broadcast-able side or AQE to plan it; it exists to cover
the bounded-interval shape (event ∈ [start, end]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (backward as-of).

    Ties (right_ts == left_ts) match, as in DuckDB/pandas ``ASOF``
    semantics.  When several right rows share the same as-of timestamp
    the one with the greatest ``right_cols`` tuple wins (deterministic;
    struct max over (ts, cols)).

    ``tolerance`` (e.g. ``'2 hours'``) drops matches older than
    ``left_ts - tolerance``.

    Output: every left column, then ``right_ts`` (the matched as-of
    timestamp) and ``right_cols`` — all null when no match.
    """
    from pyspark.sql.types import StructType

    rstate_type = StructType([right.schema[c] for c in [right_ts, *right_cols]])
    lrow_type = StructType([left.schema[c] for c in left.columns])
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rstate_type).alias("_rstate"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        F.struct(
            F.col(right_ts), *[F.col(c) for c in right_cols]
        ).alias("_rstate"),
    )
    # right rows sort before left rows at equal timestamps (_side asc) so
    # a same-instant right row IS visible to the left row; among right
    # rows sharing a timestamp the greatest _rstate struct sorts last and
    # wins (determinism).
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_rstate"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "_asof", F.last("_rstate", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1)
    if tolerance:
        out = out.withColumn(
            "_asof",
            F.when(
                F.col(f"_asof.{right_ts}")
                >= F.col("_t") - F.expr(f"INTERVAL {tolerance}"),
                F.col("_asof"),
            ),
        )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(c) for c in [right_ts, *right_cols]],
    )


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str,
    start: str,
    end: str,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to interval rows of the same key with
    ``start <= ts <= end`` (closed interval).

    The equi-key keeps this a hash join with a residual range filter —
    Catalyst never builds the cross product.  Use when intervals are a
    dimension (sessions, maintenance windows, validity ranges); for
    point-in-history lookups prefer :func:`asof_join`.
    """
    cond = (
        (facts[on] == intervals[on])
        & (facts[ts] >= intervals[start])
        & (facts[ts] <= intervals[end])
    )
    return facts.join(intervals, cond, how)


def interpolate_series(
    df: DataFrame,
    t_col: str,
    val_col: str,
    part_cols: list[str],
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation of missing values in a (typically resampled)
    time series: each NULL gets the time-weighted blend of the nearest
    observed values before and after it; leading/trailing gaps take the
    nearest single observation (edge hold).

    Two windows per partition — last-observation-carried-backward and
    -forward via ``last/first(..., ignorenulls=True)`` with unbounded
    frames.  ONE shuffle on ``part_cols`` serves both windows (same
    partitioning, two sort-frames); no self-join, no driver loop.  At
    100 TB each series interpolates inside its own partition — the
    operator scales with the number of series, and a single giant
    series falls back to one task (resample first; an interpolation
    input is already one row per grid slot).

    Output: input + ``<val_col>_interp`` (double).
    """
    out_col = out_col or f"{val_col}_interp"
    w_prev = (
        Window.partitionBy(*part_cols)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*part_cols)
        .orderBy(t_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(val_col).cast("double")
    t = F.col(t_col).cast("timestamp").cast("long")  # epoch seconds
    t_obs = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_t = F.last(t_obs, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    next_t = F.first(t_obs, ignorenulls=True).over(w_next)
    frac = (t - prev_t) / (next_t - prev_t)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .when(next_t == prev_t, prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return df.withColumn(out_col, interp)
