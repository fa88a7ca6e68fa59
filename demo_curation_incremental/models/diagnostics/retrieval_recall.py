from dbt_core_gcloud_template_spark.operators import similarity


def model(dbt, session):
    """DIAGNOSTICS stage (r9 verdict #4 — the triad's third leg as a
    DAG stage): recall@k of IVF retrieval over the kept corpus against
    exhaustive cosine truth, probing the SAME codebook artifact the
    semantic tier assigns with (the ``codebook`` stage) — the
    nprobe/n_lists-vs-answer-quality number from
    operators/similarity.py:ann_recall_eval, produced by the run
    itself and thresholdable through ``engine monitor --min-recall``
    like its two siblings (reference analog: the log-metric policy
    layer, infra/90-monitoring.sh:114-145).

    Numbers land in this node's one-row table AND its run_results
    ``metrics`` dict (via ``dbt.record_metric``).  Unlike the other
    two legs there is NO quadratic truth side — the exhaustive
    baseline is one corpus pass with the query block broadcast — so
    the scale knob is simply the size of the sampled query set
    (``diag_retrieval_query_ids`` var).
    """
    dbt.config(materialized="table")
    kept = dbt.ref("docs_kept")
    emb = dbt.source("raw", "embeddings")
    kept_emb = emb.join(
        kept.select("doc_id"), emb["vec_id"] == kept["doc_id"], "inner"
    ).select("vec_id", "embedding")
    cents = dbt.ref("codebook").select("c_id", "vector")
    q_ids = [
        int(x)
        for x in dbt.config.get(
            "diag_retrieval_query_ids", [3, 47, 101, 205, 333]
        )
    ]
    m = similarity.ann_recall_eval(
        kept_emb,
        "vec_id",
        "embedding",
        query_ids=q_ids,
        k=int(dbt.config.get("diag_retrieval_k", 5)),
        n_lists=int(dbt.config.get("semantic_n_lists", 8)),
        nprobe=int(dbt.config.get("diag_retrieval_nprobe", 2)),
        centroids=cents,
    )
    row = m.first()
    dbt.record_metric("retrieval_recall", row["recall"])
    dbt.record_metric("retrieval_n_queries", row["n_queries"])
    dbt.record_metric("retrieval_n_exact", row["n_exact"])
    # the eager .first() above computed everything; rebuild the row as
    # a local frame so materialization doesn't re-run the eval
    return session.createDataFrame([row], m.schema)
