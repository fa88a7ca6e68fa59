from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import drift


def model(dbt, session):
    """DIAGNOSTICS stage (r10 continuation — the data-distribution leg
    beside the recall/AUC legs): PSI of TODAY's raw arrivals against
    the ingested history, per pinned corpus feature
    (operators/drift.py:corpus_drift_features — fixed numeric edges
    plus pinned-vocabulary language mix and source mix, the same
    bootstrap-artifact rule the codebook follows; a bucket space
    derived from the data being measured would measure itself).  A crawler
    change, a source-mix shift, or an upstream quality regression
    shows up here BEFORE it shows up as recall/AUC decay downstream —
    thresholdable through ``engine monitor --max-psi``
    (drift-degraded policy, a CEILING: bigger PSI is worse).

    STORED STATE = this table: per-day (feature, bucket, n, ingest_lo)
    bucket-count DELTAS, the span_index delta-log pattern applied to
    distribution monitoring.  Counts are additive, so the history
    baseline is a plain SUM over stored deltas (``ingest_lo <
    day_lo``) — the corpus history is NEVER rescanned; each day costs
    one column-pruned scan of the day's batch plus a KB-sized fold
    (``psi_from_counts``).  Compact the deltas offline when the day
    count grows, exactly like the span index.

    Day-1 semantics: no stored history ⇒ psi is NULL ("no baseline",
    not "no drift") and the recorded metrics are None — the metrics
    channel carries None explicitly and the monitor skips them.
    Retry idempotency: the PSI fold excludes today's tag, so a re-run
    recomputes the same numbers, and the anti-join on ``ingest_lo``
    appends nothing twice.

    No quadratic side and no corpus-sized diagnostic work, so like the
    AUC leg this stage needs no sampling knob.  Disable the group with
    ``diagnostics: +enabled: false``.
    """
    dbt.config(materialized="incremental", incremental_strategy="append")
    raw = dbt.source("raw", "documents")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    feats = drift.corpus_drift_features()
    batch = raw.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    batch_counts = drift.bucket_counts(batch, feats)
    if dbt.is_incremental():
        hist = (
            session.table(dbt.this)
            .filter(F.col("ingest_lo") < lo)
            .groupBy("feature", "bucket")
            .agg(F.sum("n").alias("n"))
        )
    else:
        hist = batch_counts.limit(0)
    m = drift.psi_from_counts(hist, batch_counts)
    for r in m.collect():  # vocabulary-sized: one row per feature
        dbt.record_metric(f"{r['feature']}_psi", r["psi"])
    delta = batch_counts.withColumn("ingest_lo", F.lit(lo).cast("bigint"))
    if dbt.is_incremental():
        delta = delta.join(
            session.table(dbt.this).select("ingest_lo").distinct(),
            "ingest_lo",
            "left_anti",
        )
    return delta
