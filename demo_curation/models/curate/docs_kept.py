from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import dedup


def model(dbt, session):
    """Curation gate + exact dedup: keep documents above the quality
    floor AND past the safety gate (Gopher rules + blocklist, r4),
    then collapse byte-identical texts to their canonical (minimum)
    doc_id.  The gates are doc_id equi-joins; the dedup groups by
    md5(text) so only 32-char digests shuffle, never document bodies."""
    dbt.config(materialized="table")
    docs = dbt.ref("stg_documents")
    quality = dbt.ref("doc_quality")
    safety = dbt.ref("doc_safety")
    floor = float(dbt.config.get("min_quality", 0.5))
    good = quality.filter(F.col("quality_score") >= floor).select("doc_id")
    safe = safety.filter(F.col("blocklist_keep")).select("doc_id")
    kept = docs.join(good, "doc_id").join(safe, "doc_id")
    canon = dedup.exact_dedup(kept, "text", "doc_id").select(
        F.col("canonical_id").alias("doc_id"), "n_copies"
    )
    return kept.join(canon, "doc_id").select(
        "doc_id", "text", "lang", "source", "n_chars", "n_copies"
    )
