from dbt_core_gcloud_template_spark.operators import text_analysis


def model(dbt, session):
    """Per-document quality + language-ID signals.  One FUSED map-only
    projection (operators/text_analysis.py:quality_lang_signals) —
    value-identical to the earlier quality_score ⋈ lang_id composition,
    but with a single tokenize pass and zero joins: at 100 TB the old
    id equi-join shuffled the corpus against itself purely to glue two
    projections of the same rows back together (r13, guide §2.4)."""
    dbt.config(materialized="table")
    docs = dbt.ref("stg_documents")
    return text_analysis.quality_lang_signals(docs, "doc_id", "text")
