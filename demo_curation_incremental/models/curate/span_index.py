from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import dedup


def model(dbt, session):
    """Daily SPAN tier, index half: the batch's window-hash counts
    tagged with the batch's ``ingest_lo``, appended — the delta-log
    form of :func:`operators.dedup.update_window_hash_index`.
    Consumers reconstruct the as-of index with a history filter +
    additive groupBy (see docs_despanned), which keeps the fold
    order-independent of the despan stage inside one build; compact
    the deltas offline with ``_merge_count_index`` (or store the
    artifact form, ``WindowHashIndex``, which pins k) when the day
    count grows.  Enumeration input is the batch's FULLY-deduped
    survivors — the same set the despan stage cleans — so the folded
    index equals the one-shot ``window_hash_index`` over all
    survivors.  Map-only enumeration + one batch-sized groupBy."""
    dbt.config(materialized="incremental", incremental_strategy="append")
    kept = dbt.ref("docs_kept")
    near = dbt.ref("near_dup_flags")
    sem = dbt.ref("semantic_flags")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    k = int(dbt.config.get("span_k", 8))
    batch = kept.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    uniq = (
        batch.join(
            near.filter(~F.col("is_duplicate")).select("doc_id"), "doc_id"
        ).join(
            sem.filter(F.col("is_duplicate")).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    )
    # The delta carries the k it was enumerated with (the
    # WindowHashIndex provenance contract in delta-log form): a later
    # run with a changed span_k var must fail loudly rather than fold
    # two incompatible hash spaces — docs_despanned enforces it.
    delta = (
        dedup.window_hash_index(uniq, "text", k=k)
        .withColumn("ingest_lo", F.lit(lo).cast("bigint"))
        .withColumn("k", F.lit(k).cast("int"))
    )
    # Retry idempotency: a re-appended delta would DOUBLE the folded
    # counts — if this day's delta already exists, emit nothing (the
    # anti-join on the day tag is declarative; no driver-side probe).
    if dbt.is_incremental():
        delta = delta.join(
            session.table(dbt.this).select("ingest_lo").distinct(),
            "ingest_lo",
            "left_anti",
        )
    return delta
