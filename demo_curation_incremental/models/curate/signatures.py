from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import dedup


def model(dbt, session):
    """Daily NEAR-DUP tier, storage half: MinHash signatures of the
    batch's exact-tier survivors, appended to the stored signature
    table — signatures are computed ONCE at ingest (map-only over the
    batch alone) and reused by every later day's candidate join, the
    precondition that keeps daily LSH O(|batch| x bucket) instead of
    re-signing 100 TB of history (operators/dedup.py:
    lsh_incremental_pairs docstring).  Store bucketed by band key at
    scale so even the probe shuffle is batch-only."""
    dbt.config(materialized="incremental", incremental_strategy="append")
    kept = dbt.ref("docs_kept")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    batch_kept = kept.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    # Retry idempotency: a re-run of a completed day must append
    # nothing (anti-join against the ids already stored — at scale the
    # stored side prunes to the day's id range before the join).
    if dbt.is_incremental():
        batch_kept = batch_kept.join(
            session.table(dbt.this)
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("doc_id"),
            "doc_id",
            "left_anti",
        )
    return dedup.minhash_signatures(
        batch_kept,
        "doc_id",
        "text",
        k_shingle=int(dbt.config.get("lsh_k_shingle", 3)),
        n_hashes=int(dbt.config.get("lsh_n_hashes", 8)),
    )
