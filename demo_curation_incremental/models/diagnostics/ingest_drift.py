from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import drift


def model(dbt, session):
    """DIAGNOSTICS stage (r10 continuation — the data-distribution leg
    beside the recall/AUC legs): PSI of TODAY's raw arrivals against
    the ingested history, per pinned corpus feature
    (operators/drift.py:corpus_drift_features — fixed numeric edges
    plus PINNED language and source vocabularies, the same
    bootstrap-artifact rule the codebook follows; a bucket space
    derived from the data being measured would measure itself).  A
    crawler change, a source-mix shift, or an upstream quality
    regression shows up here BEFORE it shows up as recall/AUC decay
    downstream — thresholdable through ``engine monitor --max-psi``
    (drift-degraded policy, a CEILING: bigger PSI is worse).

    Fold/metric/retry mechanics live in
    :func:`operators.drift.incremental_drift_model` (shared verbatim
    with the ``embedding_drift`` sibling): per-day (feature, bucket,
    n, ingest_lo, spec_hash) count DELTAS — the span_index delta-log
    pattern — folded with a plain SUM, never rescanning history, and
    guarded by the SPEC FINGERPRINT: editing the pinned edges or
    vocabularies is a deliberate re-baseline, and the guard degrades
    it to day-1 semantics (PSI None, "no baseline under this spec")
    instead of folding incompatible bucket spaces into spurious PSI.
    Compact the deltas offline when the day count grows, exactly like
    the span index.

    Day-1 semantics: no stored history ⇒ psi is NULL ("no baseline",
    not "no drift") and the recorded metrics are None — the metrics
    channel carries None explicitly and the monitor skips them.

    No quadratic side and no corpus-sized diagnostic work, so like the
    AUC leg this stage needs no sampling knob.  Disable the group with
    ``diagnostics: +enabled: false``.
    """
    dbt.config(materialized="incremental", incremental_strategy="append")
    raw = dbt.source("raw", "documents")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    feats = drift.corpus_drift_features()
    batch = raw.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    return drift.incremental_drift_model(
        dbt,
        session,
        drift.bucket_counts(batch, feats),
        drift.spec_fingerprint(feats),
        lo,
    )
