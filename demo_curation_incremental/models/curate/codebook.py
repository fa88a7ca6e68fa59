def model(dbt, session):
    """IVF codebook — the semantic tier's TRAINING ARTIFACT as a DAG
    stage (r8 verdict #2 carried into the product loop): one (c_id,
    vector) table every daily assignment reuses, instead of an inline
    stand-in buried in the assignment stage.

    ``semantic_codebook`` var selects the trainer:

    - ``trained`` (default): distributed Lloyd's k-means
      (operators/similarity.py:kmeans_fit, ``semantic_kmeans_iters``
      iterations) over the RAW embedding corpus.  Training reads the
      raw source — never the surviving corpus — so the codebook is
      day-independent and the replay invariant (day-3 ≡ one-shot)
      holds: every build derives the identical deterministic artifact.
      In production you train once at bootstrap and pin this table
      (skip rebuilding it via node selection); here the stage retrains
      per build, which on a static raw table is equivalent.
    - ``standin``: the n_lists smallest raw vectors — the
      zero-training fallback (recall ≈0.29 on testdata, the datapoint
      semdedup_recall_eval priced).

    Output: c_id, vector.
    """
    from dbt_core_gcloud_template_spark.operators.similarity import (
        build_codebook,
    )

    dbt.config(materialized="table")
    return build_codebook(
        dbt.source("raw", "embeddings"),
        "vec_id",
        "embedding",
        mode=str(dbt.config.get("semantic_codebook", "trained")),
        k=int(dbt.config.get("semantic_n_lists", 8)),
        iters=int(dbt.config.get("semantic_kmeans_iters", 2)),
    )
