from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import text_analysis


def model(dbt, session):
    """DIAGNOSTICS stage (r10 build session — the quality tier's eval
    leg beside the three recall legs): Mann-Whitney AUC of a
    classifier trained on the RAW corpus (same day-independence rule
    as the ``codebook`` stage, so replay holds) against its own
    labels, the one number that says whether model-based quality
    filtering would actually separate classes on THIS corpus —
    thresholdable through ``engine monitor --min-auc``
    (classifier-degraded policy), next to its recall siblings.

    Scale: training is one feature pass to a ≤n_buckets aggregate;
    the AUC reduces the corpus to a bounded (score, pos, neg)
    histogram before any window runs
    (operators/text_analysis.py:classifier_auc) — no quadratic side,
    so unlike the near-dup/semantic legs this stage needs no sampling
    knob.  Disable the group with ``diagnostics: +enabled: false``.
    """
    dbt.config(materialized="table")
    docs = dbt.source("raw", "documents")
    label = str(dbt.config.get("diag_auc_label_filter", "lang = 'en'"))
    n_buckets = int(dbt.config.get("quality_n_buckets", 256))
    wtab = text_analysis.train_quality_weights(
        docs, "text", label_filter=label, n_buckets=n_buckets
    )
    scored = text_analysis.quality_classifier(
        docs, "doc_id", "text", n_buckets=n_buckets, weights=wtab
    )
    lab = scored.join(
        docs.select("doc_id", F.expr(label).alias("pos")), "doc_id"
    )
    m = text_analysis.classifier_auc(lab, "pos")
    row = m.first()
    dbt.record_metric("quality_auc", row["auc"])
    dbt.record_metric("quality_auc_n_pos", row["n_pos"])
    dbt.record_metric("quality_auc_n_neg", row["n_neg"])
    # the eager .first() above computed everything; rebuild the row as
    # a local frame so materialization doesn't re-run the eval
    return session.createDataFrame([row], m.schema)
