from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import dedup
from dbt_core_gcloud_template_spark.operators.fences import UNSET


def model(dbt, session):
    """Daily SPAN tier, removal half: incremental ExactSubstr over the
    batch's fully-deduped survivors against the PRIOR span index
    (``ingest_lo < day_lo`` history deltas, additively folded), then
    token-level span removal — appended.  Temporal-first semantics: a
    window already in the index had its kept copy at ingest, so every
    batch occurrence is removed; a corpus-new window keeps its
    batch-first occurrence.  Because day slices are id-ordered, this
    coincides with the one-shot global-first rule — the replay test's
    central equality.  History is touched only through its hash index;
    the corpus is never re-windowed
    (operators/dedup.py:duplicated_spans_incremental).
    max_span_occurrences (var) fences boilerplate chrome."""
    dbt.config(materialized="incremental", incremental_strategy="append")
    kept = dbt.ref("docs_kept")
    near = dbt.ref("near_dup_flags")
    sem = dbt.ref("semantic_flags")
    idx = dbt.ref("span_index")
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
    # Retry idempotency: already-despanned batch docs drop out, so a
    # re-run of a completed day appends nothing.
    if dbt.is_incremental():
        uniq = uniq.join(
            session.table(dbt.this)
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("doc_id"),
            "doc_id",
            "left_anti",
        )
    # Provenance check (the WindowHashIndex contract on the delta-log
    # form): every stored delta must have been enumerated with THIS
    # run's k, else the fold would merge incompatible hash spaces.
    # One tiny distinct over the index's k column.
    stored_ks = [r["k"] for r in idx.select("k").distinct().collect()]
    if any(sk != k for sk in stored_ks):
        raise ValueError(
            f"span_index holds deltas built with k={sorted(set(stored_ks))} "
            f"but this run uses span_k={k}: rebuild the index (full "
            "refresh) instead of folding incompatible hash spaces"
        )
    prior_index = (
        idx.filter(F.col("ingest_lo") < lo)
        .groupBy("win_hash")
        .agg(F.sum("n_occurrences").cast("bigint").alias("n_occurrences"))
    )
    # absent var -> UNSET (profile decides); configured null -> an
    # explicit None (consciously unfenced, warned under strict)
    cap = dbt.config.get("max_span_occurrences", UNSET)
    spans = dedup.duplicated_spans_incremental(
        uniq,
        prior_index,
        "doc_id",
        "text",
        k=k,
        min_count=2,
        keep_first=True,
        max_occurrences=int(cap) if cap not in (None, UNSET) else cap,
    )
    cleaned = dedup.remove_duplicated_spans(
        uniq, spans, "doc_id", "text", keep_first=True
    )
    return (
        uniq.select("doc_id", "lang", "source")
        .join(cleaned, "doc_id")
        .select(
            "doc_id", "lang", "source", "n_tokens", "n_removed", "cleaned_text"
        )
    )
