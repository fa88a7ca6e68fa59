from dbt_core_gcloud_template_spark.operators import similarity


def model(dbt, session):
    """DIAGNOSTICS stage (r8 verdict #3): recall of the semantic
    tier's cluster-scoped pairing against exhaustive cosine truth,
    under the EXACT codebook artifact and threshold semantic_flags.py
    assigns with (the ``codebook`` stage and ``semantic_threshold``) —
    the n_lists-vs-coverage number from semdedup_recall_eval, produced
    by the run itself and thresholdable through ``engine monitor``.

    Numbers land in this node's table AND its run_results ``metrics``
    dict (via ``dbt.record_metric``) next to the fence telemetry.  The
    truth side is deliberately O(n²) telemetry; ``diag_sample_mod``
    (var) hash-gates both truth and assignment input deterministically
    for scale (operators/similarity.py:semdedup_recall_eval).  Disable
    the stage group with ``models: diagnostics: +enabled: false``.
    """
    dbt.config(materialized="table")
    kept = dbt.ref("docs_kept")
    emb = dbt.source("raw", "embeddings")
    kept_emb = emb.join(
        kept.select("doc_id"), emb["vec_id"] == kept["doc_id"], "inner"
    ).select("vec_id", "embedding")
    n_lists = int(dbt.config.get("semantic_n_lists", 8))
    # the SAME codebook artifact semantic_flags.py assigns against — a
    # recall number for a codebook nobody runs is noise
    cents = dbt.ref("codebook").select("c_id", "vector")
    mod = int(dbt.config.get("diag_sample_mod", 1))
    m = similarity.semdedup_recall_eval(
        kept_emb,
        "vec_id",
        "embedding",
        centroids=cents,
        n_lists=n_lists,
        threshold=float(dbt.config.get("semantic_threshold", 0.95)),
        sample_mod=mod if mod > 1 else None,
    )
    row = m.first()
    dbt.record_metric("semantic_recall", row["recall"])
    dbt.record_metric("semantic_n_true_pairs", row["n_true_pairs"])
    return session.createDataFrame([row], m.schema)
