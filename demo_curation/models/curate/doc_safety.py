from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import text_analysis


def model(dbt, session):
    """Safety/heuristic gate (the round-4 filter stage): published
    Gopher quality rules (mean word length, symbol ratio, alphabetic
    fraction, stop-word presence) AND the category-blocklist hit-ratio
    gate, one row per doc with both keep flags and a combined verdict.
    Both operators are map-only column pipelines — this model adds ZERO
    shuffles to the DAG at any corpus size."""
    dbt.config(materialized="table")
    docs = dbt.ref("stg_documents")
    gopher = text_analysis.gopher_rules(docs, "doc_id", "text").select(
        "doc_id",
        F.col("keep").alias("gopher_keep"),
        "mean_word_len",
        "alpha_word_frac",
    )
    # threshold from project vars: the synthetic fixture's vocabulary
    # overlaps the demo blocklists heavily, so the demo runs at 0.2
    # (drops ~20%, all languages survive); production sets its own.
    thr = float(dbt.config.get("max_blocklist_ratio", 0.2))
    block = text_analysis.blocklist_filter(
        docs, "doc_id", "text", max_hit_ratio=thr
    ).select("doc_id", F.col("keep").alias("blocklist_keep"), "hit_ratio")
    return gopher.join(block, "doc_id").select(
        "doc_id",
        "gopher_keep",
        "blocklist_keep",
        (F.col("gopher_keep") & F.col("blocklist_keep")).alias("safety_keep"),
        "mean_word_len",
        "alpha_word_frac",
        "hit_ratio",
    )
