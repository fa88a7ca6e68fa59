from dbt_core_gcloud_template_spark.operators import text_analysis


def model(dbt, session):
    """Per-document quality + language-ID signals (Python model: the
    imperative composition of two operator outputs is DataFrame-native,
    not SQL).  Both operators are map-only column expressions — at
    100 TB this model is one shuffle-free pass over the corpus."""
    dbt.config(materialized="table")
    docs = dbt.ref("stg_documents")
    q = text_analysis.quality_score(docs, "doc_id", "text")
    lid = text_analysis.lang_id(docs, "doc_id", "text").select(
        "doc_id", "predicted_lang"
    )
    return q.join(lid, "doc_id")
