from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import drift


def model(dbt, session):
    """DIAGNOSTICS stage (r10 continuation — the data-distribution leg
    beside the recall/AUC legs): PSI of TODAY's raw arrivals against
    the already-ingested history, per pinned text feature
    (operators/drift.py:text_drift_features — fixed edges, the same
    bootstrap-artifact rule the codebook follows; edges derived from
    the data being measured would measure themselves).  A crawler
    change, a source-mix shift, or an upstream quality regression
    shows up here BEFORE it shows up as recall/AUC decay downstream —
    thresholdable through ``engine monitor --max-psi``
    (drift-degraded policy, a CEILING: bigger PSI is worse).

    Day-1 semantics: no history yet ⇒ psi is NULL ("no baseline", not
    "no drift") and the recorded metrics are None — the metrics
    channel carries None explicitly and the monitor skips them.

    Scale: two column-pruned scans of the raw source (history + batch)
    into vocabulary-sized (feature, bucket) aggregates; everything
    after is KB-sized.  No quadratic side, so like the AUC leg this
    stage needs no sampling knob.  Disable the group with
    ``diagnostics: +enabled: false``.
    """
    dbt.config(materialized="table")
    raw = dbt.source("raw", "documents")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    history = raw.filter(F.col("doc_id") < lo)
    batch = raw.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    m = drift.psi_drift(history, batch, drift.text_drift_features())
    rows = m.collect()  # vocabulary-sized: one row per feature
    for r in rows:
        dbt.record_metric(f"{r['feature']}_psi", r["psi"])
    # the collect above computed everything; materialize the local
    # rows so the table write doesn't re-scan the corpus
    return session.createDataFrame(rows, m.schema)
