"""Temporal-join and ordered-statistics coverage queries: as-of join
(union+window idiom vs DuckDB's native ASOF JOIN as the oracle),
interval range join over derived session windows, and exact
percentile / stddev / correlation aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import temporal
from ..sources.registry import load_table
from . import register


# ---------------------------------------------------------------------------
# events_asof_daily_state — as-of join: attach to every event the
# day-state row (per-user daily total) with the greatest state_ts <=
# event ts.  Spark side is operators/temporal.py:asof_join (one shuffle
# on user_id, window last(ignorenulls)); the oracle is DuckDB's native
# ASOF JOIN — two independent implementations of the same semantics.
# ---------------------------------------------------------------------------
@register(
    "events_asof_daily_state",
    oracle="""
    WITH daily AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS state_ts,
             CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS day_value
      FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts, d.state_ts, d.day_value
    FROM events e
    ASOF LEFT JOIN daily d
      ON e.user_id = d.user_id AND d.state_ts <= e.ts
    """,
)
def events_asof_daily_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("state_ts")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("day_value")
    )
    left = e.select("event_id", "user_id", "ts")
    return temporal.asof_join(
        left, daily, on="user_id", left_ts="ts", right_ts="state_ts",
        right_cols=["day_value"],
    )


# ---------------------------------------------------------------------------
# events_in_session_range — interval range join: count raw events
# falling inside each derived session interval [session_start, last_ts]
# of the same user.  Equi-key (user_id) + residual range predicate —
# a hash join, never a cross product.
# ---------------------------------------------------------------------------
@register(
    "events_in_session_range",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    ), intervals AS (
      SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT i.user_id, i.session_start,
           CAST(count(*) AS BIGINT) AS n_in_range
    FROM intervals i
    JOIN events e
      ON e.user_id = i.user_id
     AND e.ts BETWEEN i.session_start AND i.last_ts
    GROUP BY i.user_id, i.session_start
    """,
)
def events_in_session_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .events_batch import events_sessionized

    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("e_user"), "ts"
    )
    intervals = events_sessionized(spark, sf_dir).select(
        "user_id", "session_start", "last_ts"
    )
    joined = temporal.range_join(
        e.withColumnRenamed("e_user", "user_id").alias("e"),
        intervals.alias("i"),
        on="user_id",
        ts="ts",
        start="session_start",
        end="last_ts",
    )
    return (
        joined.groupBy(F.col("i.user_id").alias("user_id"), "session_start")
        .agg(F.count("*").cast("bigint").alias("n_in_range"))
    )


# ---------------------------------------------------------------------------
# part_price_stats — ordered/statistical aggregates per part type:
# exact interpolated percentiles (Spark `percentile` == DuckDB
# `quantile_cont`), sample stddev, and price↔size correlation.  At
# 100 TB swap `percentile` for `approx_percentile` (t-digest, no
# per-group sort) — exact here because the oracle must match.
# ---------------------------------------------------------------------------
@register(
    "part_price_stats",
    oracle="""
    SELECT p_type,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(round(quantile_cont(p_retailprice, 0.25), 4) AS DOUBLE) AS price_p25,
           CAST(round(quantile_cont(p_retailprice, 0.50), 4) AS DOUBLE) AS price_median,
           CAST(round(quantile_cont(p_retailprice, 0.75), 4) AS DOUBLE) AS price_p75,
           CAST(round(stddev_samp(p_retailprice), 4) AS DOUBLE) AS price_stddev,
           CAST(round(corr(p_retailprice, p_size), 4) + 0.0 AS DOUBLE) AS price_size_corr
    FROM part
    GROUP BY p_type
    ORDER BY p_type
    """,
)
def part_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_type")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.expr("percentile(p_retailprice, 0.25)"), 4)
            .cast("double")
            .alias("price_p25"),
            F.round(F.expr("percentile(p_retailprice, 0.50)"), 4)
            .cast("double")
            .alias("price_median"),
            F.round(F.expr("percentile(p_retailprice, 0.75)"), 4)
            .cast("double")
            .alias("price_p75"),
            F.round(F.stddev_samp("p_retailprice"), 4).cast("double").alias("price_stddev"),
            # + 0.0 normalizes IEEE -0.0 (tiny negative corr rounds to
            # a differently-signed zero in DuckDB vs Spark)
            (F.round(F.corr("p_retailprice", "p_size"), 4) + F.lit(0.0))
            .cast("double")
            .alias("price_size_corr"),
        )
        .orderBy("p_type")
    )
