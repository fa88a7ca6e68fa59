from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling models)

from dbt_core_gcloud_template_spark.operators import dedup


def model(dbt, session):
    """DIAGNOSTICS stage (r8 verdict #3): recall/precision of the
    near-dup tier's banding configuration against exact n-gram Jaccard
    truth on the CURRENT kept corpus — the number an operator tunes
    bands with, produced by the run itself instead of a bench registry
    (reference analog: the log-metric policy layer,
    infra/90-monitoring.sh:114-145).

    The numbers land twice: as this node's one-row table, and — via
    ``dbt.record_metric`` — in this node's ``metrics`` dict in
    run_results.json next to the fence telemetry, where ``engine
    monitor --min-recall`` thresholds them.

    Reads the production tier's banding configuration from the SAME
    project vars signatures.py / near_dup_pairs.py read (lsh_bands /
    lsh_k_shingle / lsh_n_hashes — one source of truth; a diagnostic
    of a configuration nobody runs is noise).  The exact-
    truth side is O(corpus²)-ish, so ``diag_sample_fraction`` (var)
    hash-gates it deterministically at scale — the whole story of
    operators/dedup.py:lsh_recall_eval.  Disable the stage group with
    ``models: diagnostics: +enabled: false``.
    """
    dbt.config(materialized="table")
    docs = dbt.ref("docs_kept").select("doc_id", "text")
    frac = float(dbt.config.get("diag_sample_fraction", 1.0))
    bands = [
        [int(c) for c in band]
        for band in dbt.config.get(
            "lsh_bands", [[0, 1], [2, 3], [4, 5], [6, 7]]
        )
    ]
    m = dedup.lsh_recall_eval(
        docs,
        "doc_id",
        "text",
        bands=bands,
        k_shingle=int(dbt.config.get("lsh_k_shingle", 3)),
        n_hashes=int(dbt.config.get("lsh_n_hashes", 8)),
        jaccard_threshold=float(dbt.config.get("diag_jaccard_threshold", 0.3)),
        sample_fraction=frac if frac < 1.0 else None,
    )
    row = m.first()
    dbt.record_metric("lsh_recall", row["recall"])
    dbt.record_metric("lsh_precision", row["precision"])
    dbt.record_metric("lsh_n_exact_pairs", row["n_exact"])
    # one eager .first() above computed everything; rebuild the row as
    # a local frame so materialization doesn't re-run the O(n²) truth
    return session.createDataFrame([row], m.schema)
