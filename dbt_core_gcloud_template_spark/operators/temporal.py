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
