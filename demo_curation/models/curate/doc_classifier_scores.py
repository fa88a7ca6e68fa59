from dbt_core_gcloud_template_spark.operators import text_analysis


def model(dbt, session):
    """Classifier INFERENCE stage: score every document with the weight
    table the quality_weights stage just trained (train -> infer through
    the engine materialization path).  The stored table rides the plan
    as a literal array (bounded <=n_buckets collect), so scoring stays a
    map-only zero-shuffle pass over the corpus."""
    dbt.config(materialized="table")
    docs = dbt.ref("stg_documents")
    wtab = dbt.ref("quality_weights")
    n_buckets = int(dbt.config.get("quality_n_buckets", 256))
    return text_analysis.quality_classifier(
        docs, "doc_id", "text", n_buckets=n_buckets, threshold=0.5,
        weights=wtab,
    )
