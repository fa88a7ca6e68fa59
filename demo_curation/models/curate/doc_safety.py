from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import text_analysis


def model(dbt, session):
    """Safety/heuristic gate (the round-4 filter stage): published
    Gopher quality rules AND the category-blocklist hit-ratio gate, one
    row per doc with both keep flags and a combined verdict.  One FUSED
    map-only projection (operators/text_analysis.py:safety_signals) —
    value-identical to the earlier gopher_rules ⋈ blocklist_filter
    composition, but with a single tokenize pass and zero joins (r13,
    guide §2.4: the id join shuffled the corpus against itself)."""
    dbt.config(materialized="table")
    docs = dbt.ref("stg_documents")
    # threshold from project vars: the synthetic fixture's vocabulary
    # overlaps the demo blocklists heavily, so the demo runs at 0.2
    # (drops ~20%, all languages survive); production sets its own.
    thr = float(dbt.config.get("max_blocklist_ratio", 0.2))
    sig = text_analysis.safety_signals(
        docs, "doc_id", "text", max_hit_ratio=thr
    )
    return sig.select(
        "doc_id",
        "gopher_keep",
        "blocklist_keep",
        (F.col("gopher_keep") & F.col("blocklist_keep")).alias("safety_keep"),
        "mean_word_len",
        "alpha_word_frac",
        "hit_ratio",
    )
