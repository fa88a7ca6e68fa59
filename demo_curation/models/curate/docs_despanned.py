from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import dedup


def model(dbt, session):
    """ExactSubstr span removal over the near-dup-unique,
    semantically-unique survivors — the span granularity of the
    engine's four-tier dedup funnel (quality gate -> exact dedup ->
    LSH canonicalize -> SemDeDup flags -> SPAN removal -> shards).  keep_first=True applies
    the paper's all-but-one rule so the globally-first occurrence of
    every duplicated window survives; max_span_occurrences (var) caps
    the hot-window skew for boilerplate chrome.  Plan: the audited
    3-exchange spans pipeline + one tiny spans aggregate + one doc_id
    left join; the token rebuild is a map-only indexed HOF."""
    dbt.config(materialized="table")
    kept = dbt.ref("docs_kept")
    flags = dbt.ref("near_dup_flags").filter(~F.col("is_duplicate")).select(
        "doc_id"
    )
    sem_dups = dbt.ref("semantic_dup_flags").filter(
        F.col("is_duplicate")
    ).select("doc_id")
    # Materialize the survivor set ONCE (r13): three consumers below
    # (span detection, token rebuild, final metadata join) would each
    # re-execute the two gating joins over the stored tables otherwise.
    uniq = (
        kept.join(flags, "doc_id")
        .join(sem_dups, "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    k = int(dbt.config.get("span_k", 8))
    from dbt_core_gcloud_template_spark.operators.fences import UNSET

    cap = dbt.config.get("max_span_occurrences", UNSET)
    spans = dedup.duplicated_spans(
        uniq,
        "doc_id",
        "text",
        k=k,
        min_count=2,
        keep_first=True,
        max_occurrences=int(cap) if cap not in (None, UNSET) else cap,
    )
    cleaned = dedup.remove_duplicated_spans(
        uniq, spans, "doc_id", "text", keep_first=True
    )
    return uniq.select("doc_id", "lang", "source").join(cleaned, "doc_id").select(
        "doc_id", "lang", "source", "n_tokens", "n_removed", "cleaned_text"
    )
