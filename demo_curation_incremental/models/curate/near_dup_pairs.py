from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import dedup


def model(dbt, session):
    """Daily NEAR-DUP tier, candidate half: banded-LSH pairs for the
    batch against the stored signatures, appended to the stored pair
    set.  ``lsh_incremental_pairs`` emits only pairs touching a new
    doc, so each (a_id, b_id) pair lands exactly once — on the day its
    later member arrives — and the appended table converges to the
    one-shot pair set (the replay test pins this).  Only band keys
    shuffle; history enters through its stored signatures, never its
    text.  lsh_max_bucket_size (var) fences degenerate bands; trips
    land in this node's run_results `fences` record."""
    dbt.config(materialized="incremental", incremental_strategy="append")
    sigs = dbt.ref("signatures")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    sig_new = sigs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    sig_old = sigs.filter(F.col("doc_id") < lo)
    from dbt_core_gcloud_template_spark.operators.fences import UNSET

    # absent var -> UNSET (profile decides); configured null -> an
    # explicit None (consciously unfenced, warned under strict)
    cap = dbt.config.get("lsh_max_bucket_size", UNSET)
    bands = [
        [int(c) for c in band]
        for band in dbt.config.get(
            "lsh_bands", [[0, 1], [2, 3], [4, 5], [6, 7]]
        )
    ]
    pairs = dedup.lsh_incremental_pairs(
        sig_new,
        sig_old,
        "doc_id",
        bands,
        max_bucket_size=int(cap) if cap not in (None, UNSET) else cap,
    )
    # Retry idempotency: every pair's LATER member (b_id, since
    # a_id < b_id and day slices are id-ordered) lands in the batch
    # range, so a re-run's duplicates anti-join away against just the
    # stored pairs of this range — partition-prunable at scale.
    if dbt.is_incremental():
        pairs = pairs.join(
            session.table(dbt.this)
            .filter((F.col("b_id") >= lo) & (F.col("b_id") < hi))
            .select("a_id", "b_id"),
            ["a_id", "b_id"],
            "left_anti",
        )
    return pairs
