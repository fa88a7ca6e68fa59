"""Structured Streaming operators over the events table (SURVEY.md
§2.9/§7.6 north-star; the reference is batch-only — streaming is the
designed extension, reference cadence cron `0 2 * * *`,
release.yml:69).

Logical operators mirror queries/events_batch.py exactly (tumbling /
session windows, dedup) so the batch oracles validate the semantics;
these versions run incrementally with watermarked state.

Scale design: watermark bounds state; `dropDuplicatesWithinWatermark`
holds only in-horizon keys; `foreachBatch` lands micro-batches into
the incremental-model merge path (Delta MERGE in production), giving
exactly-once end-to-end with checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import ensure_session_confs, load_table


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events parquet (schema from a batch
    probe; nanos ts normalized to TIMESTAMP like the batch path)."""
    ensure_session_confs(spark)
    import hashlib
    import os
    import tempfile

    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        # file-stream sources need a directory (in production the table
        # IS a directory of arriving files); expose the single testdata
        # file through a symlinked dir
        d = os.path.join(
            tempfile.gettempdir(),
            f"events_stream_{hashlib.md5(path.encode()).hexdigest()[:8]}",
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "events.parquet")
        if not os.path.exists(link):
            os.symlink(path, link)
        path = d
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def tumbling_counts(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregate (late data beyond the
    watermark is dropped; state evicted per window close)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sessionized(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Watermarked session windows per user (state = open sessions only)."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming face of the batch exact-dedup operator."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(df: DataFrame, query_name: str, output_mode: str = "append"):
    """Drain the stream with availableNow into a memory sink; returns the
    finished StreamingQuery (results: spark.table(query_name))."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_into_incremental(
    stream: DataFrame,
    spark: SparkSession,
    target_fqn: str,
    key_cols: list[str],
    checkpoint_dir: str,
    write_relation,
):
    """foreachBatch → incremental-merge sink (the streaming version of
    the `incremental` materialization; Delta MERGE in production)."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        if not spark.catalog.tableExists(target_fqn):
            write_relation(batch, target_fqn, {})
            return
        existing = spark.table(target_fqn)
        keys = batch.select(*key_cols).distinct()
        kept = existing.join(keys, key_cols, "left_anti")
        write_relation(
            kept.unionByName(batch, allowMissingColumns=True),
            target_fqn,
            {},
        )

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
