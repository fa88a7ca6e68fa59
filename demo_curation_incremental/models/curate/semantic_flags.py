from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import similarity
from dbt_core_gcloud_template_spark.operators.fences import UNSET


def model(dbt, session):
    """Daily SEMANTIC tier: SemDeDup verdicts for the batch's kept
    embeddings against the STORED kept corpus
    (operators/similarity.py:semdedup_incremental — temporal
    semantics: a stored match keeps the stored copy).  Centroids come
    from the ``codebook`` stage — the training artifact, by default a
    real kmeans model trained at BOOTSTRAP and pinned
    (``codebook_pinned``), so every day's verdicts share one
    clustering and the replay invariant day-N ≡ one-shot holds even on
    a growing raw corpus; a codebook that retrained per build would
    re-cluster history and break it (demonstrated in
    tests/test_curation_project.py).
    Per-day cost: batch assignment + one batch×cluster join; old×old
    pairs never re-enumerate.  The max_cluster_size fence (var) counts
    the STORED side and runs in split mode, so a degenerate stored
    cluster re-buckets by sign probe instead of hogging one task."""
    dbt.config(materialized="incremental", incremental_strategy="append")
    kept = dbt.ref("docs_kept")
    emb = dbt.source("raw", "embeddings")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    kept_emb = emb.join(
        kept.select("doc_id"), emb["vec_id"] == kept["doc_id"], "inner"
    ).select("vec_id", "embedding")
    e_new = kept_emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
    # Retry idempotency: already-flagged batch vectors drop out, so a
    # re-run of a completed day appends nothing.
    if dbt.is_incremental():
        e_new = e_new.join(
            session.table(dbt.this)
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_anti",
        )
    e_old = kept_emb.filter(F.col("vec_id") < lo)
    n_lists = int(dbt.config.get("semantic_n_lists", 8))
    cents = dbt.ref("codebook").select("c_id", "vector")
    cap = dbt.config.get("semantic_max_cluster_size", UNSET)
    return similarity.semdedup_incremental(
        e_new,
        e_old,
        "vec_id",
        "embedding",
        n_lists=n_lists,
        threshold=float(dbt.config.get("semantic_threshold", 0.95)),
        centroids=cents,
        max_cluster_size=int(cap) if cap not in (None, UNSET) else cap,
        on_oversize="split",
        split_planes=4,
        dim=int(dbt.config.get("embedding_dim", 64)),
    ).select(
        F.col("vec_id").alias("doc_id"), "list_id", "canonical_id", "is_duplicate"
    )
