"""Batch analogs of the streaming operators over the events table
(SURVEY.md §2.9 / §7.6): tumbling, sliding, and session windows,
JSON extraction, and streaming-style dedup — each with a DuckDB
oracle.  The true Structured Streaming versions live in
``streaming/events.py`` (same logical ops via readStream; tested in
pytest — streams aren't SQL-oracle-able).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import register


def _dec_value() -> F.Column:
    return F.col("value").cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# events_tumbling_1h — tumbling window aggregate (F.window == time_bucket).
# ---------------------------------------------------------------------------
@register(
    "events_tumbling_1h",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(_dec_value()), 2).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "n_users", "total_value")
    )


# ---------------------------------------------------------------------------
# events_sliding_1h_15m — sliding window: every event lands in exactly 4
# overlapping 1h windows on the 15m grid.
# ---------------------------------------------------------------------------
@register(
    "events_sliding_1h_15m",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
               AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1, 2
    """,
)
def events_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


# ---------------------------------------------------------------------------
# events_sessionized — session windows (30 min gap) per user.  The oracle
# reproduces Spark's strict-merge rule (gap >= 30 min ⇒ new session) via
# gaps-and-islands.  Shared constant: the SAME oracle gates the batch
# form and the streaming drain (events_stream_sessions) — the whole
# point of the streaming gate is that the drained result is
# indistinguishable from the batch aggregate.
# ---------------------------------------------------------------------------
_SESSIONIZED_ORACLE = """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sess_id
    """


@register("events_sessionized", oracle=_SESSIONIZED_ORACLE)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec_value()), 2).cast("double").alias("total_value"),
        )
        .select("user_id", "session_start", "last_ts", "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# events_json_stats — JSON extraction from the props payload (§2.8 analog).
# ---------------------------------------------------------------------------
@register(
    "events_json_stats",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(k_value) AS BIGINT) AS total_k,
           round(CAST(sum(k_value) AS DOUBLE) / count(*), 6) AS avg_k
    FROM e GROUP BY event_type
    """,
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k_value").cast("bigint").alias("total_k"),
        F.round(F.sum("k_value").cast("double") / F.count("*"), 6).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# events_dedup — deterministic exact dedup (keep min event_id per
# (user, type, hour)); the batch analog of dropDuplicatesWithinWatermark.
# ---------------------------------------------------------------------------
@register(
    "events_dedup",
    oracle="""
    SELECT user_id, event_type,
           time_bucket(INTERVAL '1 hour', ts) AS hour_start,
           CAST(min(event_id) AS BIGINT) AS kept_event_id,
           CAST(count(*) AS BIGINT) AS n_in_group
    FROM events GROUP BY 1, 2, 3
    """,
)
def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", "event_type", F.window("ts", "1 hour").alias("w")
    ).agg(
        F.min("event_id").alias("kept_event_id"),
        F.count("*").alias("n_in_group"),
    ).select(
        "user_id", "event_type", F.col("w.start").alias("hour_start"),
        "kept_event_id", "n_in_group",
    )


# ---------------------------------------------------------------------------
# events_user_totals_stateful — the applyInPandasWithState custom
# stateful operator (streaming/events.py:user_running_totals_stateful)
# drained with availableNow.  Update mode emits one running-total row
# per user PER MICRO-BATCH, and micro-batch boundaries follow the
# source file layout — so the raw sink is layout-dependent.  The query
# reduces the update log to each user's FINAL update (n_events is a
# strictly increasing running count, so max-by-n_events IS the last
# emission), making the result invariant to file layout / batching —
# pinned by the partition-invariance gate.  total_value is a float sum
# inside pandas (not decimal) — rounded to 2dp on both sides, the way
# the operator itself emits it.
# ---------------------------------------------------------------------------
@register(
    "events_user_totals_stateful",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value,
           max(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def events_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    name = f"q_state_{uuid.uuid4().hex[:8]}"
    se.run_available_now(se.user_running_totals_stateful(stream), name, "update")
    final = F.max(
        F.struct("n_events", "total_value", "last_ts")
    ).alias("_f")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(final)
        .select("user_id", "_f.n_events", "_f.total_value", "_f.last_ts")
    )


# ---------------------------------------------------------------------------
# events_resampled_6h — gap-filled resample: EVERY 6h bucket per type,
# including empty ones (dense time dimension from the data's own
# min/max — no driver-side loop; the classic warehouse gap-fill).
# ---------------------------------------------------------------------------
@register(
    "events_resampled_6h",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '6 hours', min(ts)) AS lo,
             time_bucket(INTERVAL '6 hours', max(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '6 hours')) AS bucket
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT g.bucket, t.event_type,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events
    FROM grid g CROSS JOIN types t
    LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = t.event_type
    """,
)
def events_resampled_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "6 hours").start
    agg = ev.groupBy(bucket.alias("bucket"), "event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    # dense grid: one aggregate row -> sequence -> explode (distributed,
    # no collect; at 100 TB min/max come from parquet footer stats)
    bounds = ev.agg(
        F.min(bucket).alias("lo"), F.max(bucket).alias("hi")
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    return (
        grid.crossJoin(F.broadcast(types))
        .join(agg, ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# events_funnel_daily — view -> purchase conversion within 1h, by day
# of the view (the classic product funnel as a range self-join).
# ---------------------------------------------------------------------------
@register(
    "events_funnel_daily",
    oracle="""
    WITH views AS (
      SELECT user_id, ts FROM events WHERE event_type = 'view'
    ),
    conv AS (
      SELECT DISTINCT v.user_id, CAST(v.ts AS DATE) AS d
      FROM views v JOIN events p
        ON p.user_id = v.user_id AND p.event_type = 'purchase'
       AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '1 hour'
    )
    SELECT dd.d, dd.n_view_users,
           CAST(coalesce(c.n_conv, 0) AS BIGINT) AS n_converted,
           round(coalesce(c.n_conv, 0) / dd.n_view_users, 6) AS conversion_rate
    FROM (
      SELECT CAST(ts AS DATE) AS d,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_view_users
      FROM views GROUP BY 1
    ) dd
    LEFT JOIN (
      SELECT d, CAST(count(*) AS BIGINT) AS n_conv FROM conv GROUP BY d
    ) c USING (d)
    """,
)
def events_funnel_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    # range self-join keyed on user_id: the equi key carries the
    # shuffle; the time-band predicate filters within each user's rows
    conv = (
        views.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("n_conv"))
    )
    daily = views.groupBy(F.to_date("ts").alias("d")).agg(
        F.count_distinct("user_id").cast("bigint").alias("n_view_users")
    )
    return daily.join(conv, "d", "left").select(
        "d",
        "n_view_users",
        F.coalesce(F.col("n_conv"), F.lit(0)).cast("bigint").alias("n_converted"),
        F.round(
            F.coalesce(F.col("n_conv"), F.lit(0)) / F.col("n_view_users"), 6
        ).alias("conversion_rate"),
    )


# ---------------------------------------------------------------------------
# events_interpolated_6h — resample to a 6h grid, then linearly
# interpolate empty buckets per event_type (operators/temporal.py
# interpolate_series: LOCF/NOCB windows + time-weighted blend, one
# shuffle).  Bucket value = exact decimal sum / count, so both engines
# interpolate from identical doubles.
# ---------------------------------------------------------------------------
@register(
    "events_interpolated_6h",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '6 hours', min(ts)) AS lo,
             time_bucket(INTERVAL '6 hours', max(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '6 hours')) AS bucket
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket, event_type,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT g.bucket, t.event_type, a.v
      FROM grid g CROSS JOIN types t
      LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = t.event_type
    ),
    wins AS (
      SELECT bucket, event_type, v, epoch(bucket) AS tt,
        last_value(v IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN epoch(bucket) END IGNORE NULLS)
            OVER wp AS pt,
        first_value(v IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN epoch(bucket) END IGNORE NULLS)
            OVER wn AS nt
      FROM series
      WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT bucket, event_type,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      WHEN nt = pt THEN pv
                      ELSE pv + (nv - pv) * (tt - pt) / (nt - pt) END, 6)
               AS value_interp
    FROM wins
    """,
)
def events_interpolated_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import interpolate_series

    ev = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "6 hours").start
    agg = ev.groupBy(bucket.alias("bucket"), "event_type").agg(
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*"))
        .alias("v")
    )
    bounds = ev.agg(F.min(bucket).alias("lo"), F.max(bucket).alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    series = (
        grid.crossJoin(F.broadcast(types))
        .join(agg, ["bucket", "event_type"], "left")
    )
    out = interpolate_series(series, "bucket", "v", ["event_type"])
    return out.select(
        "bucket", "event_type", F.round("v_interp", 6).alias("value_interp")
    )


# ---------------------------------------------------------------------------
# events_stream_tumbling — the SAME hourly aggregate computed through
# Structured Streaming: file-source readStream -> watermarked tumbling
# window -> availableNow drain into a memory sink, returned as the
# result table.  Complete output mode ⇒ the drained result equals the
# batch aggregate, so the batch oracle gates the streaming path — the
# driver contract exercises the real streaming machinery, not a batch
# stand-in.  (n_users is omitted: count(DISTINCT) isn't supported in
# streaming aggregations.)
# ---------------------------------------------------------------------------
@register(
    "events_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import (
        read_events_stream,
        run_available_now,
        tumbling_counts,
    )

    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_counts(stream)
    run_available_now(agg, "events_stream_tumbling_mem", output_mode="complete")
    return spark.table("events_stream_tumbling_mem")


# ---------------------------------------------------------------------------
# events_stream_dedup_incremental — the streaming face of the
# incremental-dedup ladder, oracle-gated like the batch tiers: a
# file-source readStream replays the events table as the "daily crawl
# arriving as a stream", a stream-static broadcast left-anti join drops
# keys already in the STORED index (every event_id ≡ 0 mod 3 — the
# deterministic stand-in for the persisted ingest index), and the
# watermarked state store bounds within-stream repeats.  availableNow
# drains into a memory sink; append mode ⇒ the drained survivor-id SET
# equals the batch anti-join's, so a plain DuckDB anti-filter gates the
# real streaming machinery (per-micro-batch index re-read, state store,
# watermark eviction), not a batch stand-in.  Payload columns are NOT
# taken from the drained rows: dropDuplicatesWithinWatermark keeps one
# ARBITRARY row per key, so if event_id were ever duplicated the
# surviving payload would be micro-batch-layout-dependent.  Instead the
# drained ids semi-join back to the batch table and payloads are
# min-aggregated per id — arbitrary-free on both sides, so the oracle
# equivalence holds for ANY key multiplicity, not just the current
# testdata's unique event_ids (advisor r7).
# ---------------------------------------------------------------------------
@register(
    "events_stream_dedup_incremental",
    oracle="""
    SELECT event_id, min(user_id) AS user_id,
           min(event_type) AS event_type,
           CAST(min(value) AS DOUBLE) AS value
    FROM events
    WHERE event_id % 3 <> 0
    GROUP BY event_id
    """,
)
def events_stream_dedup_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.registry import load_table
    from ..streaming.events import (
        dedup_stream_against_index,
        read_events_stream,
        run_available_now,
    )

    index = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 3 == 0)
        .select("event_id")
        .distinct()
    )
    stream = read_events_stream(spark, sf_dir)
    # Watermark wider than the table's time span: availableNow replays
    # a FINITE file set whose micro-batch boundaries are a layout
    # accident, and dropDuplicatesWithinWatermark discards rows older
    # than the watermark — a short horizon would make survivorship
    # depend on file order (the layout-invariance gate catches exactly
    # this).  A live deployment tunes the horizon to its real lateness
    # bound; the replay needs determinism, so nothing may be "late".
    fresh = dedup_stream_against_index(
        stream, index, watermark="3650 days"
    )
    run_available_now(
        fresh, "events_stream_dedup_inc_mem", output_mode="append"
    )
    # The stream decides WHICH ids survive; payloads come from an
    # arbitrary-free min-aggregation over those ids so the result is
    # identical no matter which physical row the state store retained.
    survivor_ids = (
        spark.table("events_stream_dedup_inc_mem").select("event_id").distinct()
    )
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.join(survivor_ids, "event_id", "left_semi")
        .groupBy("event_id")
        .agg(
            F.min("user_id").alias("user_id"),
            F.min("event_type").alias("event_type"),
            F.min("value").cast("double").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# events_stream_followups — the stream-STREAM interval join under the
# value hash: the events table replays as three id-ordered micro-batches
# (stage_id_ordered_chunks — arrival order uncorrelated with event time,
# so view/click pairs really do straddle micro-batch boundaries and the
# drain exercises cross-batch join state), each view pairs with the same
# user's clicks within 30 minutes AFTER it, and the appended result must
# equal the batch self-join — which a plain DuckDB interval self-join
# gates.  The lateness horizon is wider than the table's time span for
# the same replay-determinism reason events_stream_dedup_incremental
# documents: a finite replay may not classify anything "late" or the
# emitted set would depend on chunk boundaries.  At scale the horizon is
# the real out-of-orderness bound and join state is user-partitioned in
# the state store, evicted as the watermark passes lead_ts + within.
# ---------------------------------------------------------------------------
@register(
    "events_stream_followups",
    oracle="""
    SELECT l.user_id, l.event_id AS lead_id, r.event_id AS follow_id,
           l.ts AS lead_ts, r.ts AS follow_ts
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'view' AND r.event_type = 'click'
     AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
    """,
)
def events_stream_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import (
        read_events_stream,
        run_available_now,
        stream_stream_followups,
    )

    stream = read_events_stream(spark, sf_dir, staged_chunks=3)
    joined = stream_stream_followups(
        stream, follow_type="click", lead_type="view",
        within="30 minutes", watermark="3650 days",
    )
    run_available_now(
        joined, "events_stream_followups_mem", output_mode="append"
    )
    return spark.table("events_stream_followups_mem")


# ---------------------------------------------------------------------------
# events_stream_enriched — stream-STATIC enrichment + streaming aggregate
# under the value hash: the same three-chunk replay joins each arriving
# event to the broadcast customer dim (user_id = c_custkey; the static
# side re-reads per micro-batch, the production pattern for a dim that
# refreshes between batches) and a global per-segment aggregate runs in
# COMPLETE mode, so the final emitted table equals the batch join+group —
# gated by the plain DuckDB join.  Money sums go through DECIMAL(18,2)
# like every other oracle so the streaming state's fold order can't
# perturb the hash.  At scale: broadcast dim ⇒ no shuffle on the stream
# side; the unwindowed complete-mode agg holds one row per segment
# (vocabulary-sized state), the cheap end of streaming aggregation.
# ---------------------------------------------------------------------------
@register(
    "events_stream_enriched",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def events_stream_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import (
        enrich_with_dim,
        read_events_stream,
        run_available_now,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    stream = read_events_stream(spark, sf_dir, staged_chunks=3)
    agg = (
        enrich_with_dim(stream, dim, on="user_id", how="inner")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    run_available_now(
        agg, "events_stream_enriched_mem", output_mode="complete"
    )
    return spark.table("events_stream_enriched_mem")


# ---------------------------------------------------------------------------
# events_stream_sessions — streaming SESSION WINDOWS under the value
# hash, the last streaming shape that was gated only in batch form.
# Session aggregations are APPEND-only in Spark (update/complete raise
# STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION), and append emits a
# session exactly once — when the watermark passes its end — so the
# replay is built so the watermark can do that deterministically:
#   - chunks are TIME-ordered (chunk_by="ts"), so arrival order equals
#     event-time order and no row is ever late for ANY delay ≥ 0
#     (within-batch disorder can't drop rows — the watermark only
#     advances between batches);
#   - a final single-row SENTINEL chunk sits 3650 days past max(ts),
#     advancing the final watermark past every real session so the
#     no-data flush batch emits them all; the sentinel's own session
#     stays open and never emits (its marker user_id = -1 is filtered
#     defensively anyway).
# Sessions still genuinely straddle micro-batches (a user active
# across a chunk boundary has an OPEN session carried in the state
# store, extended/merged by the next batch), so the drain exercises
# real cross-batch session-merge machinery and watermark-driven state
# eviction — gated by the SAME gaps-and-islands oracle as the batch
# form.  At scale: state = open sessions only, user-partitioned in the
# state store; the sentinel is the standard heartbeat pattern for
# flushing a finite feed.
# ---------------------------------------------------------------------------
@register("events_stream_sessions", oracle=_SESSIONIZED_ORACLE)
def events_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import (
        read_events_stream,
        run_available_now,
        sessionized,
    )

    stream = read_events_stream(
        spark, sf_dir, staged_chunks=3, chunk_by="ts",
        watermark_sentinel={"event_id": -1, "user_id": -1},
    )
    sess = sessionized(stream, gap="30 minutes", watermark="1 minute")
    run_available_now(
        sess, "events_stream_sessions_mem", output_mode="append"
    )
    return (
        spark.table("events_stream_sessions_mem")
        # the sentinel never emits (its session is still open at drain
        # end), but filter its marker key anyway so the guarantee is
        # local, not an artifact of drain timing; eqNullSafe keeps any
        # genuine NULL-user sessions the oracle would also keep
        .filter(~F.col("user_id").eqNullSafe(-1))
        .select(
            "user_id", "session_start", "last_ts", "n_events", "total_value"
        )
    )


# ---------------------------------------------------------------------------
# events_retention_cohorts — weekly retention matrix: users grouped by
# first-active ISO week, fraction still active k weeks later.  Both
# engines truncate weeks to Monday, so cohort keys agree; offsets are
# exact integer day-diffs / 7.  Plan: one distinct (user, week) shuffle,
# then user-keyed min + two vocabulary-sized aggregates.
# ---------------------------------------------------------------------------
@register(
    "events_retention_cohorts",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    first AS (
      SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
      FROM first GROUP BY cohort_week
    ),
    m AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, uw.wk) // 7 AS INT)
               AS week_offset,
             CAST(count(DISTINCT uw.user_id) AS BIGINT) AS n_active
      FROM uw JOIN first f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT m.cohort_week, m.week_offset, s.n_cohort, m.n_active,
           round(m.n_active / s.n_cohort, 6) AS retention
    FROM m JOIN sizes s USING (cohort_week)
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("n_cohort")
    )
    m = (
        uw.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )
    return m.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_cohort",
        "n_active",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


# ---------------------------------------------------------------------------
# events_markov_transitions — first-order event-type transition matrix
# per user journey: P(next | current) with exact integer counts and a
# 6dp probability.  Ordering is (ts, event_id) so ties are
# deterministic in both engines.  Plan: ONE user-keyed window shuffle
# (lead over each user's timeline), then a transition-vocabulary-sized
# aggregate with map-side combine.
# ---------------------------------------------------------------------------
@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    ),
    t AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (SELECT cur, sum(n) AS n_cur FROM t GROUP BY cur)
    SELECT t.cur, t.nxt, t.n,
           round(t.n / tot.n_cur, 6) AS p
    FROM t JOIN tot USING (cur)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    t = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = t.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return t.join(F.broadcast(tot), "cur").select(
        "cur", "nxt", "n", F.round(F.col("n") / F.col("n_cur"), 6).alias("p")
    )


# ---------------------------------------------------------------------------
# events_interarrival_stats — per event-type inter-arrival distribution
# (rate-anomaly baseline): gaps computed as exact epoch-microsecond
# integers on each user's timeline, then order-independent exact
# percentiles — fully deterministic across engines.
# ---------------------------------------------------------------------------
@register(
    "events_interarrival_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_us / 1000000.0, 0.5), 6) AS p50_s,
           round(quantile_cont(gap_us / 1000000.0, 0.9), 6) AS p90_s
    FROM seq WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return seq.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.round(F.expr("percentile(gap_us / 1000000.0D, 0.5D)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(gap_us / 1000000.0D, 0.9D)"), 6).alias("p90_s"),
    )


# ---------------------------------------------------------------------------
# events_rolling_7d_users — trailing-7-day DISTINCT users per day (the
# rolling-DAU/WAU problem).  Exact, at scale: a window frame cannot do
# COUNT(DISTINCT), so each (user, active-day) pair EXPLODES onto the
# ≤7 target days it contributes to (bounded fan-out), then one
# day-keyed distinct count.  Days are bounded to the observed range so
# both engines emit the same grid.
# ---------------------------------------------------------------------------
@register(
    "events_rolling_7d_users",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    bounds AS (SELECT max(d) AS max_d FROM uw),
    contrib AS (
      SELECT user_id,
             CAST(unnest(generate_series(d, least(d + 6, max_d),
                                         INTERVAL 1 DAY)) AS DATE)
               AS target_day
      FROM uw CROSS JOIN bounds
    )
    SELECT target_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users_7d
    FROM contrib GROUP BY target_day
    """,
)
def events_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uw = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    max_d = uw.agg(F.max("d").alias("max_d"))
    days = F.sequence(
        F.col("d"),
        F.least(F.date_add(F.col("d"), 6), F.col("max_d")),
        F.expr("INTERVAL 1 DAY"),
    )
    return (
        uw.crossJoin(F.broadcast(max_d))
        .select("user_id", F.explode(days).alias("target_day"))
        .groupBy("target_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("users_7d"))
    )
