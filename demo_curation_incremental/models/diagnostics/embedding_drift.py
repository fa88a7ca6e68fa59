import hashlib

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

    Fold/metric/retry mechanics are the SHARED skeleton
    (:func:`operators.drift.incremental_drift_model`): per-day
    (feature, bucket, n, ingest_lo, spec_hash) assignment-count
    deltas, history folded by SUM over matching-spec rows — and here
    the spec fingerprint is SALTED with the codebook's content, so a
    deliberate retrain (``--full-refresh``) re-baselines the fold
    (day-1 semantics under the new codebook) instead of folding
    assignments from two different clusterings into spurious PSI.
    Per-day cost: one broadcast map-only assignment pass over the
    day's batch (operators/similarity.py:ivf_assign) plus a k-row
    fold; the codebook collect is k×dim, the artifact's own bounded
    driver round-trip.

    Day-1 semantics: psi is None ("no baseline", not "no drift").
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
    cb_rows = sorted(
        (int(r["c_id"]), tuple(float(x) for x in r["vector"]))
        for r in cents.collect()
    )
    salt = hashlib.md5(repr(cb_rows).encode()).hexdigest()[:12]
    return drift.incremental_drift_model(
        dbt,
        session,
        drift.bucket_counts(assigned, feats),
        drift.spec_fingerprint(feats, salt=salt),
        lo,
    )
