from dbt_core_gcloud_template_spark.operators import text_analysis


def model(dbt, session):
    """Classifier TRAINING stage: one-pass Naive-Bayes log-odds weight
    table over hashed n-gram features, positives = English docs (the
    vars-driven label predicate).  Output is <= n_buckets rows at any
    corpus size — the stored model artifact the scoring stage
    broadcasts."""
    dbt.config(materialized="table")
    docs = dbt.ref("stg_documents")
    label = str(dbt.config.get("quality_label_filter", "lang = 'en'"))
    n_buckets = int(dbt.config.get("quality_n_buckets", 256))
    return text_analysis.train_quality_weights(
        docs, "text", label_filter=label, n_buckets=n_buckets
    )
