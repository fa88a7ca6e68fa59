"""Dataset drift diagnostics: Population Stability Index between two
corpus snapshots.

A production training-data pipeline re-ingests daily; the distribution
of what arrives shifts (a crawler change, a new source mix, a quality
regression upstream).  PSI is the standard early-warning number for
that shift: bucket a feature with FIXED edges, compare the two
snapshots' bucket shares, ``psi = Σ (p_i − q_i)·ln(p_i / q_i)``.  The
conventional reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
action required.  The reference template monitors its nightly builds
through log-based alerts (infra/90-monitoring.sh:114-145); drift over
the data itself is the designed extension of that policy, the same
way the recall/AUC diagnostics extend it (plans/monitor.py).

Design decisions, all chosen so a SQL oracle can reproduce the number
bit-for-bit and so day-over-day numbers stay comparable:

- **Fixed bucket edges, supplied by the caller** — never quantiles of
  either snapshot.  Quantile edges move with the data (the thing
  being measured) and are sampling-nondeterministic; fixed edges are
  the bootstrap-pinned-artifact pattern the codebook uses.  Compare
  against a pinned literal list, re-derived only when the pipeline
  owner deliberately re-baselines.
- **NULL is a bucket** (index −1), not an exclusion: drift in
  missingness is drift.
- **Epsilon-clamped shares** (``max(share, eps)``, the standard PSI
  convention) so an empty bucket on one side contributes a large
  finite term instead of ±inf.
- **6dp rounding** of the final sum: the per-bucket ``ln`` terms are
  IEEE doubles on both engines; the handful of buckets per feature
  keeps accumulated addition-order error ~1e-15, far below the
  rounding grain (same argument as corpus_term_entropy's entropy
  sum).

Scale shape: one map-side bucket assignment + ONE (feature, bucket)
aggregate per snapshot (map-side combined; output is
vocabulary-sized: n_features × n_buckets rows), a full-outer join of
the two tiny count tables, and a per-feature fold.  The corpus is
scanned once per snapshot and only the feature columns are read — at
100 TB the cost is the two column-pruned scans, everything after is
KB-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (name, value expression, bucket spec).  Bucket spec variants:
#   - sequence of FLOATS: fixed numeric edges, strictly increasing
#     (bucket = edge interval index, NULL = −1);
#   - sequence of STRINGS: pinned CATEGORY VOCABULARY — a value in the
#     list is its own bucket, anything else is "<other>", NULL is
#     "<null>" (the source-mix / language-mix drift shape; the vocab
#     is the baseline artifact, like the edges, so the bucket space
#     stays bounded AND comparable day-over-day);
#   - None: OPEN categorical — every distinct value is a bucket (only
#     for columns whose cardinality is known-small; an unbounded
#     column makes the "vocabulary-sized" claim false — pin a vocab).
#
# RESERVED LABELS: the sentinels "<null>" / "<other>" are part of the
# bucket-key contract — a column whose GENUINE string values include
# them would silently merge with the missing/out-of-vocab buckets in
# both engines (the gate would hold, but missingness drift would be
# indistinguishable from a literal-value shift).  Such columns must be
# re-encoded by the caller (e.g. prefix every value) before drifting.
FeatureSpec = tuple[str, Column, "Sequence[float] | Sequence[str] | None"]

NULL_BUCKET = "<null>"
OTHER_BUCKET = "<other>"

# The pinned default feature spec for TEXT corpora (edges are the
# baseline artifact — re-derive only on a deliberate re-baseline).
# Shared by the registry query (whose oracle mirrors these formulas in
# SQL) and the demo_curation_incremental drift diagnostics stage.
TEXT_DRIFT_EDGES: dict[str, tuple[float, ...]] = {
    "chars": (100.0, 200.0, 400.0, 800.0, 1600.0, 3200.0),
    "punct_ratio": (0.005, 0.01, 0.02, 0.04, 0.08),
    "digit_ratio": (0.001, 0.005, 0.02, 0.05),
}


def text_drift_features(text_col: str = "text") -> list[FeatureSpec]:
    """Text length, punctuation ratio, digit ratio over ``text_col``
    with the pinned :data:`TEXT_DRIFT_EDGES`.  Ratios are NULL (the −1
    bucket) for empty/NULL text — missingness drift is drift."""

    def ratio(pattern: str) -> Column:
        t = F.col(text_col)
        return F.when(
            F.length(t) > 0,
            (F.length(t) - F.length(F.regexp_replace(t, pattern, "")))
            .cast("double")
            / F.length(t),
        )

    return [
        ("chars", F.length(text_col).cast("double"), TEXT_DRIFT_EDGES["chars"]),
        ("punct_ratio", ratio("[.,;:!?]"), TEXT_DRIFT_EDGES["punct_ratio"]),
        ("digit_ratio", ratio("[0-9]"), TEXT_DRIFT_EDGES["digit_ratio"]),
    ]


# Pinned language vocabulary for the categorical drift leg: the
# languages the pipeline tunes for.  Anything else folds into
# "<other>" — a surge of unlisted languages IS the drift signal, and
# the pinned list keeps the bucket space bounded and day-comparable.
LANG_DRIFT_VOCAB: tuple[str, ...] = ("en", "de", "fr", "es")

# Pinned source vocabulary (r10 verdict stretch: the demo spec is the
# template users copy, so it must be 100 TB-safe BY DEFAULT, not by
# docstring): the crawl sources the pipeline was tuned on.  New /
# unlisted sources fold into "<other>" — a surge there is exactly the
# source-mix drift signal — and the bucket space stays bounded no
# matter how the upstream source registry grows.
SOURCE_DRIFT_VOCAB: tuple[str, ...] = (
    "src0", "src1", "src2", "src3", "src4", "src5",
    "src6", "src7", "src8", "src9", "src10", "src11",
)


def corpus_drift_features(
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    source_vocab: "Sequence[str] | None" = SOURCE_DRIFT_VOCAB,
) -> list[FeatureSpec]:
    """:func:`text_drift_features` plus the two categorical mix
    signals a crawl pipeline watches first: language mix and source
    mix, both against PINNED vocabularies (+ "<other>") by default so
    the bucket space is bounded regardless of what the crawler starts
    delivering.  Pass ``source_vocab=None`` only when the source
    registry is known-small and every distinct value should be its own
    bucket (the open-categorical spec shape)."""
    return text_drift_features(text_col) + [
        ("lang_mix", F.col(lang_col), LANG_DRIFT_VOCAB),
        ("source_mix", F.col(source_col), source_vocab),
    ]


def bucketize(value: Column, edges: Sequence[float]) -> Column:
    """Fixed-edge bucket index: NULL → −1, value < edges[0] → 0, …,
    value >= edges[-1] → len(edges).  Edges are literals, so the CASE
    chain stays inside whole-stage codegen (no UDF)."""
    b = F.when(value.isNull(), F.lit(-1))
    for i, e in enumerate(edges):
        b = b.when(value < F.lit(float(e)), F.lit(i))
    return b.otherwise(F.lit(len(edges)))


def bucket_label(value: Column, spec) -> Column:
    """The STRING bucket key for any spec variant (see
    :data:`FeatureSpec`) — numeric edge indexes are rendered as their
    decimal string so one column type carries all three shapes."""
    if spec is None:  # open categorical
        return F.when(value.isNull(), F.lit(NULL_BUCKET)).otherwise(
            value.cast("string")
        )
    if len(spec) > 0 and isinstance(spec[0], str):  # pinned vocabulary
        return (
            F.when(value.isNull(), F.lit(NULL_BUCKET))
            .when(
                value.cast("string").isin(*[str(v) for v in spec]),
                value.cast("string"),
            )
            .otherwise(F.lit(OTHER_BUCKET))
        )
    return bucketize(value, spec).cast("string")


def bucketize_sql(value_sql: str, spec) -> str:
    """The DuckDB rendering of :func:`bucket_label`, generated from
    the SAME spec so the two sides cannot drift.  Vocabulary entries
    are rendered as SQL string literals with quotes doubled — a vocab
    value containing ``'`` must produce the same bucket key as the
    Spark side, not invalid (or subtly wrong) oracle SQL."""
    if spec is None:
        return (
            f"CASE WHEN {value_sql} IS NULL THEN '{NULL_BUCKET}' "
            f"ELSE CAST({value_sql} AS VARCHAR) END"
        )
    if len(spec) > 0 and isinstance(spec[0], str):
        vocab = ", ".join("'" + str(v).replace("'", "''") + "'" for v in spec)
        return (
            f"CASE WHEN {value_sql} IS NULL THEN '{NULL_BUCKET}' "
            f"WHEN CAST({value_sql} AS VARCHAR) IN ({vocab}) "
            f"THEN CAST({value_sql} AS VARCHAR) "
            f"ELSE '{OTHER_BUCKET}' END"
        )
    whens = " ".join(
        f"WHEN {value_sql} < {float(e)!r} THEN '{i}'"
        for i, e in enumerate(spec)
    )
    return (
        f"CASE WHEN {value_sql} IS NULL THEN '-1' {whens} "
        f"ELSE '{len(spec)}' END"
    )


def bucket_counts(
    df: DataFrame,
    features: Sequence[FeatureSpec],
    count_col: str = "n",
) -> DataFrame:
    """One (feature, bucket, count) row per populated bucket — the
    vocabulary-sized sufficient statistic PSI needs.  This is also the
    incremental-fold unit: counts are additive, so a daily loop stores
    per-day deltas and folds history with a plain SUM instead of
    rescanning the corpus (the span_index delta-log pattern) —
    ``psi_from_counts`` then compares folded history to today's batch
    in O(vocabulary)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("feature"),
                bucket_label(col, spec).alias("bucket"),
            )
            for name, col, spec in features
        ]
    )
    return (
        df.select(F.explode(pairs).alias("fb"))
        .groupBy(
            F.col("fb.feature").alias("feature"),
            F.col("fb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias(count_col))
    )


def psi_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    eps: float = 1e-6,
    dp: int = 6,
) -> DataFrame:
    """PSI from two (feature, bucket, n) count tables (see
    :func:`bucket_counts`) — the join/fold half of :func:`psi_drift`,
    callable directly with a STORED/folded baseline so a daily loop
    never rescans history.  Count tables are vocabulary-sized, so
    everything here is KB-scale regardless of corpus size."""
    j = (
        ref_counts.select(
            "feature", "bucket", F.col("n").alias("ref_n")
        )
        .join(
            cur_counts.select(
                "feature", "bucket", F.col("n").alias("cur_n")
            ),
            ["feature", "bucket"],
            "full_outer",
        )
        .fillna(0, ["ref_n", "cur_n"])
    )
    w = Window.partitionBy("feature")
    j = j.withColumn("tot_ref", F.sum("ref_n").over(w)).withColumn(
        "tot_cur", F.sum("cur_n").over(w)
    )
    p = F.greatest(F.col("ref_n") / F.col("tot_ref"), F.lit(float(eps)))
    q = F.greatest(F.col("cur_n") / F.col("tot_cur"), F.lit(float(eps)))
    term = F.when(
        (F.col("tot_ref") > 0) & (F.col("tot_cur") > 0),
        (p - q) * F.log(p / q),
    )
    return (
        j.groupBy("feature")
        .agg(
            F.max("tot_ref").cast("bigint").alias("n_ref"),
            F.max("tot_cur").cast("bigint").alias("n_cur"),
            F.round(F.sum(term), dp).alias("psi"),
        )
    )


def spec_fingerprint(features: Sequence[FeatureSpec], salt: str = "") -> str:
    """Stable fingerprint of a feature spec's PINNED parts — the
    feature names and their bucket specs (edges / vocabulary / open).
    Value expressions are not canonicalizable and are deliberately
    excluded; the moving parts of a spec are its names and bucket
    spaces.

    The spec is a pinned baseline ARTIFACT, exactly like the codebook:
    changing it (new edges, a re-pinned vocabulary, a flipped default)
    is a RE-BASELINE, and folding new-spec deltas against old-spec
    history would produce spurious PSI — e.g. a vocabulary that newly
    folds 'srcN' into "<other>" leaves the old literal buckets
    ref-only and a cur-only "<other>" bucket, a large drift signal
    with no data change.  Stores that stamp this fingerprint on their
    count deltas (see :func:`incremental_drift_model`) and fold only
    matching rows degrade a spec change to day-1 semantics (PSI =
    None, "no baseline under this spec") instead.

    ``salt`` lets a caller fold an EXTERNAL pinned artifact into the
    identity — the embedding-drift stage passes a codebook fingerprint
    so a deliberate codebook retrain also re-baselines the fold.
    """
    import hashlib

    parts = []
    for name, _col, spec in features:
        if spec is None:
            parts.append(f"{name}|open")
        else:
            parts.append(f"{name}|{[str(v) for v in spec]}")
    return hashlib.md5(
        ("|".join(sorted(parts)) + f"#{salt}").encode()
    ).hexdigest()[:12]


def incremental_drift_model(
    dbt,
    session,
    batch_counts: DataFrame,
    fingerprint: str,
    lo: int,
) -> DataFrame:
    """The shared dbt-model skeleton for count-delta drift stages
    (demo_curation_incremental's ``ingest_drift`` / ``embedding_drift``
    — one implementation so a fix to the fold, retry, or day-1
    semantics cannot silently apply to only one of them):

    - STORED STATE is the model's own table: per-day (feature, bucket,
      n, ingest_lo, spec_hash) count DELTAS — counts are additive, so
      the history baseline is a plain SUM over stored deltas and the
      corpus history is never rescanned;
    - the fold reads only rows whose ``spec_hash`` matches the current
      spec fingerprint: a spec (or salted-artifact) change degrades to
      day-1 semantics instead of folding incompatible bucket spaces
      (see :func:`spec_fingerprint`);
    - per-feature PSI of (folded history vs today's batch) lands in
      the node's ``metrics`` via ``dbt.record_metric`` — None on day 1
      ("no baseline" ≠ "no drift");
    - retry idempotency: the fold excludes today's tag (``ingest_lo <
      lo``) and the delta anti-joins on (ingest_lo, spec_hash), so a
      re-run recomputes the same numbers and appends nothing twice.
      CAVEAT: that contract holds only for tags still stored as their
      own rows — retrying a day whose tag was already compacted below
      the :func:`compact_count_deltas` horizon appends nothing (the
      tombstone keeps the tag visible) but recomputes its PSI from the
      compacted fold, which may not equal the original run's numbers.
      Only compact days past any retry window (``engine optimize``
      warns when the horizon reaches the newest stored tag);
    - RESTATEMENT (a corrected re-delivery of an already-ingested
      day) is not automatic: the anti-join deliberately makes it a
      no-op.  Evict the day first — ``engine restate --table <log>
      --day <lo>`` (Engine.restate_drift_day) — then re-run; a day
      below the compaction horizon can only be restated via
      ``--full-refresh`` (its own rows no longer exist to evict);
    - legacy stores written before the spec_hash column existed are
      treated as an EXPIRED spec generation: the fold sees no matching
      rows (day-1 semantics, PSI = None) rather than failing on the
      missing column, and new deltas append under the current hash
      (schema evolution null-backfills the legacy rows).  A retried
      legacy day therefore re-ingests under the new hash — run
      ``--full-refresh`` once instead if exact history matters;
    - when the day count grows deep, rewrite the log through
      :func:`compact_count_deltas` — folds are unchanged and every
      tag stays visible to the retry anti-join (tombstones).
    """
    if dbt.is_incremental():
        stored = session.table(dbt.this)
        if "spec_hash" not in stored.columns:
            stored = stored.withColumn(
                "spec_hash", F.lit(None).cast("string")
            )
        hist = (
            stored
            .filter(
                (F.col("ingest_lo") < lo)
                & (F.col("spec_hash") == fingerprint)
                # bucket IS NULL marks compaction tag-tombstones (see
                # compact_count_deltas); genuine rows never carry one
                & F.col("bucket").isNotNull()
            )
            .groupBy("feature", "bucket")
            .agg(F.sum("n").alias("n"))
        )
    else:
        hist = batch_counts.limit(0)
    m = psi_from_counts(hist, batch_counts)
    for r in m.collect():  # vocabulary-sized: one row per feature
        dbt.record_metric(f"{r['feature']}_psi", r["psi"])
    delta = batch_counts.withColumn(
        "ingest_lo", F.lit(lo).cast("bigint")
    ).withColumn("spec_hash", F.lit(fingerprint))
    if dbt.is_incremental():
        seen = session.table(dbt.this)
        if "spec_hash" not in seen.columns:
            # legacy (pre-spec_hash) tags never match the current
            # generation's (lo, hash) pair — see the docstring
            seen = seen.withColumn("spec_hash", F.lit(None).cast("string"))
        delta = delta.join(
            seen.select("ingest_lo", "spec_hash").distinct(),
            ["ingest_lo", "spec_hash"],
            "left_anti",
        )
    return delta


# In-band compaction-horizon marker (r12): one row per compacted log
# with feature/bucket NULL, n=0, spec_hash=HORIZON_SPEC and
# ingest_lo = the horizon.  The horizon travels WITH the data — like
# the tombstones — so a catalog rewrite, restore, or loss can never
# desync "how far this log was folded" from the log itself (a horizon
# known only to catalog.json made restate unsound: a folded multi-day
# row is indistinguishable from a restatable day delta).  Genuine rows
# can't collide: spec fingerprints are 12-hex md5, never this literal.
HORIZON_SPEC = "<compact-horizon>"


def _is_horizon_marker():
    return F.col("spec_hash").eqNullSafe(F.lit(HORIZON_SPEC)) & F.col(
        "bucket"
    ).isNull()


def stored_compact_horizon(deltas: DataFrame) -> "int | None":
    """Read the in-band compaction horizon from a count-delta log (the
    max marker tag; None when the log was never compacted by
    marker-aware code)."""
    if "spec_hash" not in deltas.columns:
        return None
    v = (
        deltas.filter(_is_horizon_marker())
        .agg(F.max("ingest_lo"))
        .collect()[0][0]
    )
    return int(v) if v is not None else None


def compact_count_deltas(deltas: DataFrame, through_lo: int) -> DataFrame:
    """Offline maintenance for the count-delta log
    (:func:`incremental_drift_model`'s stored state): collapse every
    day tagged ``ingest_lo < through_lo`` into ONE row per (feature,
    bucket, spec_hash) — the fold is a plain SUM, so the collapsed row
    (tagged with the newest compacted day) folds identically for every
    future day — and returns the rewritten log (caller swaps the
    table, like ``engine optimize``).

    Retry/restatement safety: a day tag must stay VISIBLE after its
    counts are folded away, or a re-delivered old day would pass the
    (ingest_lo, spec_hash) anti-join and double-count the fold.
    Compaction therefore emits a zero-count TOMBSTONE row per
    compacted tag (marked ``bucket IS NULL`` — genuine rows can never
    carry a NULL bucket: every spec shape renders NULL values as the
    '<null>' STRING bucket).  The fold in
    :func:`incremental_drift_model` filters tombstones out; the
    anti-join still sees every tag ever ingested.  Rows at or after
    ``through_lo`` pass through untouched, so compacting "through
    day N" never rewrites days that might still be retried.

    The output also carries exactly one HORIZON MARKER row (see
    :data:`HORIZON_SPEC`) tagged ``max(through_lo, any prior
    horizon)`` — ``restate_drift_day`` refuses to evict tags below it
    no matter what happened to the catalog record.  Prior markers are
    stripped first (never folded, never tombstoned), so re-compaction
    keeps a single marker and the horizon is monotone.
    """
    spark = deltas.sparkSession
    markers = deltas.filter(_is_horizon_marker())
    data = deltas.filter(~_is_horizon_marker())
    old = data.filter(F.col("ingest_lo") < through_lo)
    rest = data.filter(F.col("ingest_lo") >= through_lo)
    folded = (
        old.filter(F.col("bucket").isNotNull())
        .groupBy("feature", "bucket", "spec_hash")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.max("ingest_lo").alias("ingest_lo"),
        )
        .select("feature", "bucket", "n", "ingest_lo", "spec_hash")
    )
    # a tombstone for every compacted tag NOT carried by some folded
    # row (anti-join, not "all but the newest": re-compacting a log
    # whose newest old tag was itself tombstone-only must not lose it)
    kept = folded.select("spec_hash", "ingest_lo").distinct()
    tombstones = (
        old.select("ingest_lo", "spec_hash")
        .distinct()
        .join(kept, ["spec_hash", "ingest_lo"], "left_anti")
        .select(
            F.lit(None).cast("string").alias("feature"),
            F.lit(None).cast("string").alias("bucket"),
            F.lit(0).cast("bigint").alias("n"),
            "ingest_lo",
            "spec_hash",
        )
    )
    marker = (
        markers.select("ingest_lo")
        .unionByName(
            spark.range(1).select(
                F.lit(int(through_lo)).cast("bigint").alias("ingest_lo")
            )
        )
        .agg(F.max("ingest_lo").alias("ingest_lo"))
        .select(
            F.lit(None).cast("string").alias("feature"),
            F.lit(None).cast("string").alias("bucket"),
            F.lit(0).cast("bigint").alias("n"),
            "ingest_lo",
            F.lit(HORIZON_SPEC).alias("spec_hash"),
        )
    )
    return (
        folded.unionByName(tombstones)
        .unionByName(
            rest.select("feature", "bucket", "n", "ingest_lo", "spec_hash")
        )
        .unionByName(marker)
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    features: Sequence[FeatureSpec],
    eps: float = 1e-6,
    dp: int = 6,
) -> DataFrame:
    """PSI of ``cur`` against the ``ref`` baseline, one row per
    feature: :func:`bucket_counts` on each snapshot, then
    :func:`psi_from_counts`.

    Output: feature, n_ref, n_cur (snapshot row counts, BIGINT), psi
    (``dp``-rounded DOUBLE; NULL when either snapshot is empty — no
    distribution to compare).  Buckets absent from BOTH snapshots
    contribute exactly 0 (eps vs eps) and are simply not enumerated.
    """
    return psi_from_counts(
        bucket_counts(ref, features),
        bucket_counts(cur, features),
        eps=eps,
        dp=dp,
    )


def psi_drift_sql(
    ref_sql: str,
    cur_sql: str,
    features: Sequence[tuple[str, str, "Sequence[float] | Sequence[str] | None"]],
    eps: float = 1e-6,
    dp: int = 6,
    prelude_ctes: str = "",
) -> str:
    """The DuckDB oracle for :func:`psi_drift`, generated from the same
    feature spec (names, value SQL, bucket specs) so the bucketing and
    the PSI formula are written exactly once per side.  ``ref_sql`` /
    ``cur_sql`` are subqueries yielding the snapshot rows;
    ``prelude_ctes`` lets the snapshots reference upstream CTEs — e.g.
    a codebook-training chain whose assignments are the drifting
    feature (any trailing comma is normalized here, so callers just
    pass the CTE definitions)."""
    prelude_ctes = prelude_ctes.strip()
    if prelude_ctes:
        prelude_ctes = prelude_ctes.rstrip(",") + ", "

    def snap(src_sql: str, tag: str) -> str:
        branches = " UNION ALL ".join(
            f"SELECT '{name}' AS feature, "
            f"{bucketize_sql(value_sql, edges)} AS bucket FROM {tag}_src"
            for name, value_sql, edges in features
        )
        return (
            f"{tag}_src AS ({src_sql}), "
            f"{tag}_fb AS ({branches}), "
            f"{tag}_cnt AS (SELECT feature, bucket, "
            f"CAST(count(*) AS BIGINT) AS {tag}_n "
            f"FROM {tag}_fb GROUP BY 1, 2)"
        )

    return f"""
    WITH {prelude_ctes}{snap(ref_sql, 'ref')}, {snap(cur_sql, 'cur')},
    j AS (
      SELECT coalesce(r.feature, c.feature) AS feature,
             coalesce(r.bucket, c.bucket) AS bucket,
             coalesce(r.ref_n, 0) AS ref_n,
             coalesce(c.cur_n, 0) AS cur_n
      FROM ref_cnt r FULL OUTER JOIN cur_cnt c
        ON r.feature = c.feature AND r.bucket = c.bucket
    ),
    t AS (
      SELECT *,
             sum(ref_n) OVER (PARTITION BY feature) AS tot_ref,
             sum(cur_n) OVER (PARTITION BY feature) AS tot_cur
      FROM j
    )
    SELECT feature,
           CAST(max(tot_ref) AS BIGINT) AS n_ref,
           CAST(max(tot_cur) AS BIGINT) AS n_cur,
           round(sum(
             CASE WHEN tot_ref > 0 AND tot_cur > 0 THEN
               (greatest(ref_n / CAST(tot_ref AS DOUBLE), {float(eps)!r})
                - greatest(cur_n / CAST(tot_cur AS DOUBLE), {float(eps)!r}))
               * ln(greatest(ref_n / CAST(tot_ref AS DOUBLE), {float(eps)!r})
                    / greatest(cur_n / CAST(tot_cur AS DOUBLE), {float(eps)!r}))
             END), {dp}) AS psi
    FROM t GROUP BY feature
    """
