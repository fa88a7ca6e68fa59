from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import drift, similarity
from dbt_core_gcloud_template_spark.operators.similarity import (
    _valid_vectors,
)


def model(dbt, session):
    """DIAGNOSTICS stage (r10 verdict #2 — the representation-space
    twin of ``ingest_drift``): PSI of TODAY's embedding arrivals'
    CLUSTER-ASSIGNMENT MIX against the ingested history, under the
    PINNED ``codebook`` artifact.  The codebook plays the
    pinned-vocabulary role (k bounded buckets; an assignment space
    that retrained with the data would measure itself — the exact
    contract ``codebook_pinned`` enforces), and a rising
    ``list_mix_psi`` means today's embeddings stopped looking like the
    corpus the codebook/IVF/SemDeDup tiers were tuned on — the signal
    that should trigger a DELIBERATE codebook re-baseline
    (``--full-refresh``), which text-feature drift alone cannot see.
    Thresholdable through ``engine monitor --max-psi`` (drift-degraded
    CEILING policy), exactly like its ``ingest_drift`` sibling
    (reference alert-policy analog: infra/90-monitoring.sh:114-145).

    STORED STATE = this table: per-day (feature, bucket, n, ingest_lo)
    assignment-count DELTAS — the same additive delta log as
    ingest_drift, so the history baseline is a plain SUM over stored
    deltas and the embedding history is NEVER rescanned.  Per-day cost
    is one broadcast map-only assignment pass over the day's batch
    (operators/similarity.py:ivf_assign) plus a k-row fold.

    Day-1 semantics: no stored history ⇒ psi is None ("no baseline",
    not "no drift").  Retry idempotency: the PSI fold excludes today's
    tag and the anti-join on ``ingest_lo`` appends nothing twice.
    Dirty rows (NULL/empty/zero vectors) are excluded by the trainer's
    own validity predicate so they cannot skew the mix.  Disable the
    group with ``diagnostics: +enabled: false``.
    """
    dbt.config(materialized="incremental", incremental_strategy="append")
    raw = dbt.source("raw", "embeddings")
    lo = int(dbt.config.get("day_lo", 0))
    hi = int(dbt.config.get("day_hi", 1_000_000_000))
    batch = _valid_vectors(
        raw.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
        "vec_id",
        "embedding",
    )
    # the SAME pinned codebook artifact every semantic stage assigns
    # against — drift measured under a different clustering would be
    # noise about nothing anybody runs
    cents = dbt.ref("codebook").select("c_id", "vector")
    assigned = similarity.ivf_assign(
        batch,
        "vec_id",
        "embedding",
        n_lists=int(dbt.config.get("semantic_n_lists", 8)),
        centroids=cents,
    )
    # open categorical is CORRECT here: the bucket space is the
    # codebook's k lists — bounded and pinned by construction
    feats = [("list_mix", F.col("list_id"), None)]
    batch_counts = drift.bucket_counts(assigned, feats)
    if dbt.is_incremental():
        hist = (
            session.table(dbt.this)
            .filter(F.col("ingest_lo") < lo)
            .groupBy("feature", "bucket")
            .agg(F.sum("n").alias("n"))
        )
    else:
        hist = batch_counts.limit(0)
    m = drift.psi_from_counts(hist, batch_counts)
    for r in m.collect():  # k-row fold: one row per feature
        dbt.record_metric(f"{r['feature']}_psi", r["psi"])
    delta = batch_counts.withColumn("ingest_lo", F.lit(lo).cast("bigint"))
    if dbt.is_incremental():
        delta = delta.join(
            session.table(dbt.this).select("ingest_lo").distinct(),
            "ingest_lo",
            "left_anti",
        )
    return delta
