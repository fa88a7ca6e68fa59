from pyspark.sql import functions as F


def model(dbt, session):
    """Daily NEAR-DUP verdicts for the batch, appended: a batch doc is
    a near-duplicate iff the stored pair set links it to a SMALLER id
    (its canonical).  Pairs always satisfy a_id < b_id and day slices
    are id-ordered, so a doc's verdict is FINAL on its ingest day —
    later days only add pairs whose larger member is new — which is
    what makes append (rather than re-flagging history) correct.
    One batch-keyed aggregate over the pair table's b_id side."""
    dbt.config(materialized="incremental", incremental_strategy="append")
    pairs = dbt.ref("near_dup_pairs")
    kept = dbt.ref("docs_kept")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    batch = kept.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    ).select("doc_id")
    # Retry idempotency: docs already flagged (a completed re-run day)
    # are excluded, so the append degrades to a no-op.
    if dbt.is_incremental():
        batch = batch.join(
            session.table(dbt.this)
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("doc_id"),
            "doc_id",
            "left_anti",
        )
    # Only batch docs get flagged, and every pair's b_id is its later
    # member (in the batch range), so the aggregate pre-filters the
    # stored pair table to the day's id range — batch-sized and
    # partition-prunable, instead of shuffling all history every day.
    peers = (
        pairs.filter((F.col("b_id") >= lo) & (F.col("b_id") < hi))
        .groupBy("b_id")
        .agg(F.min("a_id").alias("_min_peer"))
    )
    return (
        batch.join(peers, batch["doc_id"] == peers["b_id"], "left")
        .select(
            "doc_id",
            F.col("_min_peer").isNotNull().alias("is_duplicate"),
            F.coalesce("_min_peer", "doc_id").alias("canonical_id"),
        )
    )
