"""End-to-end build of the demo_curation project: the engine DAG
running the LLM-corpus curation operators (quality gate -> exact dedup
-> MinHash-LSH near-dup canonicalization -> ExactSubstr span removal
-> global shuffle shards -> mixture stats + token-budget epoch plan)
against the sf0.001 documents testdata."""

import os

import pytest
from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.plans.runner import Engine


@pytest.fixture(scope="module")
def curation(spark, tmp_path_factory):
    os.environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP DATABASE IF EXISTS curation_dev CASCADE")
    eng = Engine(spark, "demo_curation", state_dir=str(tmp_path_factory.mktemp("cur_state")))
    results, _ = eng.build()
    return eng, results


def test_curation_dag_green(curation):
    _, results = curation
    assert results.status_counts.get("error", 0) == 0
    assert results.status_counts.get("fail", 0) == 0
    # 1 view + 10 tables (r6 added docs_despanned, token_plan, and the
    # classifier train->infer pair quality_weights/doc_classifier_scores;
    # r7 added semantic_dup_flags — the SemDeDup tier in the funnel)
    assert results.status_counts["success"] == 12
    assert results.status_counts["pass"] == 12  # schema tests + retention unit test


def test_curation_funnel_monotone(curation, spark):
    raw = spark.table("curation_dev.stg_documents").count()
    kept = spark.table("curation_dev.docs_kept").count()
    despanned = spark.table("curation_dev.docs_despanned").count()
    shards = spark.table("curation_dev.corpus_shards").count()
    assert raw >= kept >= despanned >= shards > 0
    # exact dedup keeps one row per distinct text among survivors
    texts = spark.table("curation_dev.docs_kept").select("text").distinct().count()
    assert texts == kept


def test_curation_despanned_token_accounting(curation, spark):
    """The span-removal stage's bookkeeping must be internally
    consistent: removal never grows a doc, the cleaned text re-tokenizes
    to exactly n_tokens - n_removed, and keep_first guarantees no doc is
    wiped to empty (the first occurrence of every window survives)."""
    from dbt_core_gcloud_template_spark.functions.text import tokens_expr

    d = spark.table("curation_dev.docs_despanned")
    bad = d.filter(
        (F.col("n_removed") < 0)
        | (F.col("n_removed") > F.col("n_tokens"))
        | (
            F.size(tokens_expr(F.col("cleaned_text")))
            != F.col("n_tokens") - F.col("n_removed")
        )
    ).count()
    assert bad == 0
    # every despanned doc still has tokens, and totals reconcile
    agg = d.agg(
        F.sum("n_tokens").alias("toks"),
        F.sum("n_removed").alias("gone"),
        F.min(F.col("n_tokens") - F.col("n_removed")).alias("min_left"),
    ).collect()[0]
    assert agg["min_left"] > 0
    assert 0 <= agg["gone"] < agg["toks"]


def test_curation_classifier_train_infer(curation, spark):
    """The classifier train->infer pair runs through the engine: the
    weight table is bucket-bounded, and the scores stage covers every
    non-empty doc with the trained (not frozen) weights — English docs
    score above the non-English mean since they supplied the positive
    class."""
    w = spark.table("curation_dev.quality_weights")
    assert 0 < w.count() <= 256
    scores = spark.table("curation_dev.doc_classifier_scores")
    docs = spark.table("curation_dev.stg_documents").select("doc_id", "lang")
    j = scores.join(docs, "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("quality_score").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_curation_token_plan_consistent(curation, spark):
    """The token-budget plan stage: one row per source, weights sum to
    ~1, planned <= min(budget share, max_epochs * available) with the
    vars-driven budget (project.yml: 100k tokens, 4 epochs)."""
    plan = spark.table("curation_dev.token_plan").collect()
    srcs = spark.table("curation_dev.docs_despanned").select("source").distinct()
    assert len(plan) == srcs.count()
    assert abs(sum(r["weight"] for r in plan) - 1.0) < 1e-3
    for r in plan:
        assert r["planned_tokens"] <= 4 * r["n_tokens"]
        assert r["epochs"] <= 4.0
        if not r["truncated"]:
            assert r["planned_tokens"] == int(100_000 * r["weight"])


def test_curation_shards_dense(curation, spark):
    sh = spark.table("curation_dev.corpus_shards")
    per = sh.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx")
    ).collect()
    assert {r["shard"] for r in per} <= set(range(8))
    for r in per:
        assert r["mx"] == r["n"]  # pos is a dense 1..n ranking


def test_curation_stats_cover_all_langs(curation, spark):
    stats = {r["lang"]: r for r in spark.table("curation_dev.corpus_stats").collect()}
    assert set(stats) == {"en", "de", "fr", "es", "zh"}
    for r in stats.values():
        assert 0.0 < r["retention"] <= 1.0


def test_curation_shards_partitioned_layout(curation, spark):
    import os

    eng, _ = curation
    loc = eng._relation_path("curation_dev.corpus_shards")
    subdirs = [d for d in os.listdir(loc) if d.startswith("shard=")]
    assert len(subdirs) >= 2  # physically partitioned by shard


def test_curation_fence_telemetry_in_run_results(curation):
    """The 'no silent caps' rule: every armed skew fence (LSH
    max_bucket_size, span max_occurrences — set via project vars)
    reports a per-node record in run_results.json with integer
    fenced-group/row counts, even when nothing tripped, so a
    production corpus that DOES trip a fence is visible."""
    import json

    eng, results = curation
    with open(os.path.join(eng.state_dir, "run_results.json")) as f:
        rr = json.load(f)
    fences = {r["unique_id"]: r.get("fences", []) for r in rr["results"]}
    near = fences["model.curation.near_dup_flags"]
    assert any(
        f["operator"] == "lsh_candidate_pairs"
        and f["fence"] == "max_bucket_size"
        for f in near
    )
    span = fences["model.curation.docs_despanned"]
    assert any(
        f["operator"] == "duplicated_spans" and f["fence"] == "max_occurrences"
        for f in span
    )
    sem = fences["model.curation.semantic_dup_flags"]
    assert any(
        f["operator"] == "semdedup" and f["fence"] == "max_cluster_size:split"
        for f in sem
    )
    for f in near + span + sem:
        assert isinstance(f["fenced_groups"], int) and f["fenced_groups"] >= 0
        assert isinstance(f["fenced_rows"], int) and f["fenced_rows"] >= 0
    # in-memory results carry the same records
    by_id = {r.unique_id: r for r in results.results}
    assert by_id["model.curation.near_dup_flags"].fences == near


# ---------------------------------------------------------------------------
# demo_curation_incremental: the day-partitioned daily-crawl product
# loop (r7 verdict #2) — three engine builds ingest id-ordered day
# slices, dedup each against the stored indexes, append survivors, and
# fold the indexes forward; the replay must converge to the one-shot
# build of the same DAG.
# ---------------------------------------------------------------------------
_DAY_RANGES = ((0, 170), (170, 340), (340, 1_000_000_000))


@pytest.fixture(scope="module")
def curation_incremental(spark, tmp_path_factory):
    os.environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    for sch in ("curation_inc_daily", "curation_inc_oneshot"):
        spark.sql(f"DROP DATABASE IF EXISTS {sch} CASCADE")
    state = tmp_path_factory.mktemp("cur_inc_state")
    one = Engine(
        spark, "demo_curation_incremental", target="oneshot",
        state_dir=str(state / "oneshot"),
    )
    r_one, _ = one.build()
    day_runs = []
    for lo, hi in _DAY_RANGES:
        eng = Engine(
            spark, "demo_curation_incremental", target="daily",
            state_dir=str(state / f"day_{lo}"),
        )
        eng.project.vars.update({"day_lo": lo, "day_hi": hi})
        r, _ = eng.build()
        day_runs.append((eng, r))
    return one, r_one, day_runs


def test_incremental_curation_runs_green(curation_incremental):
    _, r_one, day_runs = curation_incremental
    for results in [r_one] + [r for _, r in day_runs]:
        assert results.status_counts.get("error", 0) == 0, [
            (r.unique_id, r.message)
            for r in results.results
            if r.status == "error"
        ]
    # days 2 and 3 actually exercised the incremental machinery: the
    # curate-stage appends report INSERT APPEND, not CREATE TABLE
    for _, results in day_runs[1:]:
        by_id = {r.unique_id: r for r in results.results}
        for node in (
            "docs_kept", "signatures", "near_dup_pairs", "near_dup_flags",
            "semantic_flags", "span_index", "docs_despanned",
        ):
            assert by_id[f"model.curation_inc.{node}"].message == "INSERT APPEND"


def test_incremental_replay_equals_oneshot(curation_incremental, spark):
    """The central fold invariant, end to end through the engine: after
    ingesting three id-ordered day slices incrementally (each day
    deduped against the stored digest/signature/pair/embedding/span
    state, then folded forward), every materialized relation equals the
    one-shot build over the whole corpus — exact, near-dup, semantic,
    and span tiers included, down to the cleaned text."""

    def rows(schema, table, cols):
        return sorted(
            map(tuple, spark.table(f"{schema}.{table}").select(*cols).collect())
        )

    compare = [
        ("docs_kept", ["doc_id", "text_hash", "text", "lang", "source", "n_chars"]),
        ("signatures", None),  # all columns
        ("near_dup_pairs", ["a_id", "b_id"]),  # pair_type is cadence-tagged
        ("near_dup_flags", ["doc_id", "is_duplicate", "canonical_id"]),
        ("semantic_flags", ["doc_id", "list_id", "canonical_id", "is_duplicate"]),
        ("docs_despanned", ["doc_id", "lang", "source", "n_tokens", "n_removed", "cleaned_text"]),
        ("corpus_stats", ["lang", "n_docs", "total_tokens", "removed_tokens", "avg_tokens"]),
    ]
    for table, cols in compare:
        if cols is None:
            cols = spark.table(f"curation_inc_oneshot.{table}").columns
        one = rows("curation_inc_oneshot", table, cols)
        day3 = rows("curation_inc_daily", table, cols)
        assert one, f"{table}: one-shot produced no rows"
        assert day3 == one, f"{table}: day-3 state != one-shot"
    # the folded span index (sum of per-day deltas) equals the one-shot
    # index built in a single batch
    agg = (
        "SELECT win_hash, CAST(sum(n_occurrences) AS BIGINT) AS n "
        "FROM {}.span_index GROUP BY win_hash"
    )
    one_idx = sorted(map(tuple, spark.sql(agg.format("curation_inc_oneshot")).collect()))
    day_idx = sorted(map(tuple, spark.sql(agg.format("curation_inc_daily")).collect()))
    assert day_idx == one_idx and one_idx
    # sanity: the days were real partitions, not one day doing the work
    kept = spark.table("curation_inc_daily.docs_kept")
    per_day = [
        kept.filter(f"doc_id >= {lo} AND doc_id < {hi}").count()
        for lo, hi in _DAY_RANGES
    ]
    assert all(n > 0 for n in per_day)


def test_incremental_curation_fences_in_run_results(curation_incremental):
    """Fences/telemetry ride along in the incremental loop: every
    fence-armed stage of each DAILY build reports its per-node fence
    records (the no-silent-caps rule holds on the product loop, not
    just the one-shot demo)."""
    import json

    _, _, day_runs = curation_incremental
    for eng, results in day_runs:
        with open(os.path.join(eng.state_dir, "run_results.json")) as f:
            rr = json.load(f)
        fences = {r["unique_id"]: r.get("fences", []) for r in rr["results"]}
        assert any(
            f["operator"] == "lsh_incremental_pairs"
            and f["fence"] == "max_bucket_size"
            for f in fences["model.curation_inc.near_dup_pairs"]
        )
        assert any(
            f["operator"] == "duplicated_spans_incremental"
            and f["fence"] == "max_occurrences"
            for f in fences["model.curation_inc.docs_despanned"]
        )
        assert any(
            f["operator"] == "semdedup_incremental"
            and f["fence"] == "max_cluster_size:split"
            for f in fences["model.curation_inc.semantic_flags"]
        )


def test_incremental_span_k_provenance_guard(curation_incremental, spark, tmp_path):
    """A changed span_k var must not fold into the stored span index:
    the delta rows carry the k that enumerated them (the
    WindowHashIndex provenance contract in delta-log form), and the
    despan stage fails loudly on a mismatch instead of silently
    merging two hash spaces.  Run with an empty day slice so the
    failed probe appends nothing to the daily state."""
    eng = Engine(
        spark, "demo_curation_incremental", target="daily",
        state_dir=str(tmp_path / "state"),
    )
    eng.project.vars.update(
        {"day_lo": 10**9, "day_hi": 2 * 10**9, "span_k": 9}
    )
    results, _ = eng.build()
    by_id = {r.unique_id: r for r in results.results}
    despan = by_id["model.curation_inc.docs_despanned"]
    assert despan.status == "error"
    assert "incompatible hash spaces" in despan.message
    # the matching-k stage, span_index, still appended only its (empty)
    # delta — the guard fails the consumer, not the whole DAG
    assert by_id["model.curation_inc.docs_kept"].status == "success"


def test_incremental_bloom_probe_replay_equals_oneshot(curation_incremental, spark, tmp_path):
    """The bloom probe tier slots into the daily loop without changing
    results: three daily builds with exact_probe=bloom (batch
    pre-split on a bitmap of the stored digest index, positives
    re-checked exactly) converge to the same corpus as the one-shot
    anti-join build."""
    spark.sql("DROP DATABASE IF EXISTS curation_inc_bloom CASCADE")
    for i, (lo, hi) in enumerate(_DAY_RANGES):
        eng = Engine(
            spark, "demo_curation_incremental", target="daily_bloom",
            state_dir=str(tmp_path / f"bloom_{i}"),
        )
        eng.project.vars.update(
            {"day_lo": lo, "day_hi": hi, "exact_probe": "bloom"}
        )
        results, _ = eng.build()
        assert results.status_counts.get("error", 0) == 0, [
            (r.unique_id, r.message)
            for r in results.results
            if r.status == "error"
        ]

    def rows(schema, table, cols):
        return sorted(
            map(tuple, spark.table(f"{schema}.{table}").select(*cols).collect())
        )

    for table, cols in (
        ("docs_kept", ["doc_id", "text_hash", "text", "lang", "source", "n_chars"]),
        ("docs_despanned", ["doc_id", "lang", "source", "n_tokens", "n_removed", "cleaned_text"]),
    ):
        one = rows("curation_inc_oneshot", table, cols)
        bloom = rows("curation_inc_bloom", table, cols)
        assert bloom == one and one, f"{table}: bloom daily != one-shot"


def test_incremental_day_retry_is_idempotent(curation_incremental, spark, tmp_path):
    """Re-running a completed day must be a no-op in every stage: the
    digest anti-join, the per-stage stored-id anti-joins, and the
    span-index day-tag anti-join each degrade the append to zero rows
    — the retry semantics a nightly scheduler assumes (a crashed run
    re-submitted must not double-count the folded index or duplicate
    stored rows)."""
    tables = (
        "docs_kept", "signatures", "near_dup_pairs", "near_dup_flags",
        "semantic_flags", "span_index", "docs_despanned",
    )
    before = {
        t: spark.table(f"curation_inc_daily.{t}").count() for t in tables
    }
    lo, hi = _DAY_RANGES[-1]
    eng = Engine(
        spark, "demo_curation_incremental", target="daily",
        state_dir=str(tmp_path / "retry"),
    )
    eng.project.vars.update({"day_lo": lo, "day_hi": hi})
    results, _ = eng.build()
    assert results.status_counts.get("error", 0) == 0, [
        (r.unique_id, r.message)
        for r in results.results
        if r.status == "error"
    ]
    after = {
        t: spark.table(f"curation_inc_daily.{t}").count() for t in tables
    }
    assert after == before
    # and the folded index still matches the one-shot build (no
    # double-counted occurrences slipped in)
    agg = (
        "SELECT win_hash, CAST(sum(n_occurrences) AS BIGINT) AS n "
        "FROM {}.span_index GROUP BY win_hash"
    )
    one = sorted(map(tuple, spark.sql(agg.format("curation_inc_oneshot")).collect()))
    day = sorted(map(tuple, spark.sql(agg.format("curation_inc_daily")).collect()))
    assert day == one


def test_incremental_diagnostics_metrics_in_run_results(curation_incremental, spark):
    """r8 verdict #3: the diagnostics stage group runs recall evals as
    DAG stages and their numbers land in run_results `metrics` next to
    the fence telemetry — and `engine monitor`'s recall-degraded
    policy thresholds them."""
    import json

    from dbt_core_gcloud_template_spark.plans.monitor import evaluate_alerts

    _, _, day_runs = curation_incremental
    eng, results = day_runs[-1]
    with open(os.path.join(eng.state_dir, "run_results.json")) as f:
        rr = json.load(f)
    metrics = {r["unique_id"]: r.get("metrics", {}) for r in rr["results"]}
    near = metrics["model.curation_inc.near_dup_recall"]
    assert 0.0 <= near["lsh_recall"] <= 1.0
    assert 0.0 <= near["lsh_precision"] <= 1.0
    assert near["lsh_n_exact_pairs"] >= 1  # fixture plants near-dups
    sem = metrics["model.curation_inc.semantic_recall"]
    assert 0.0 <= sem["semantic_recall"] <= 1.0
    # in-memory results carry the same dicts
    by_id = {r.unique_id: r for r in results.results}
    assert by_id["model.curation_inc.near_dup_recall"].metrics == near
    assert by_id["model.curation_inc.semantic_recall"].metrics == sem
    # the one-row diagnostic tables materialized alongside
    assert spark.table("curation_inc_daily.near_dup_recall").count() == 1
    assert spark.table("curation_inc_daily.semantic_recall").count() == 1
    # alert thresholds flow through the monitor policy: an impossible
    # floor fires a warn per diagnostics node, a trivial floor is quiet
    fired = [
        a for a in evaluate_alerts(eng.state_dir, min_recall=1.01)
        if a["policy"] == "recall-degraded"
    ]
    assert {a["subject"] for a in fired} >= {
        "model.curation_inc.near_dup_recall",
        "model.curation_inc.semantic_recall",
    }
    assert all(a["severity"] == "warn" for a in fired)
    assert not [
        a for a in evaluate_alerts(eng.state_dir, min_recall=-1.0)
        if a["policy"] == "recall-degraded"
    ]


def test_incremental_day_restatement_first_accepted_wins(
    curation_incremental, spark, tmp_path
):
    """r8 verdict #5: a real crawl also RESTATES a prior day — the same
    day re-delivered with changed rows.  Documented semantics (see
    demo_curation_incremental/README.md): FIRST-ACCEPTED WINS.  A
    doc_id the corpus already holds never re-enters even with changed
    text (the stored corpus is immutable history; without the doc_id
    guard the changed text would pass the digest probe and fork the
    doc across tiers), every stored table is byte-stable across the
    restatement, and the folded span index still equals the one-shot
    build."""
    import shutil

    tables = (
        "docs_kept", "signatures", "near_dup_pairs", "near_dup_flags",
        "semantic_flags", "span_index", "docs_despanned",
    )
    lo, hi = _DAY_RANGES[1]  # restate day 2
    kept_before = sorted(
        map(tuple, spark.table("curation_inc_daily.docs_kept")
            .select("doc_id", "text_hash", "text").collect())
    )
    counts_before = {
        t: spark.table(f"curation_inc_daily.{t}").count() for t in tables
    }
    # build the restated delivery: day-2 rows re-arrive with CHANGED
    # text; all other rows and tables are unchanged
    src = os.environ["SPARK_GRAFT_SF_DIR"]
    restated_dir = tmp_path / "restated_sf"
    restated_dir.mkdir()
    docs = spark.read.parquet(f"{src}/documents.parquet")
    from pyspark.sql import functions as F

    restated = docs.withColumn(
        "text",
        F.when(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi),
            F.concat(F.col("text"), F.lit(" restated-delivery-v2")),
        ).otherwise(F.col("text")),
    )
    restated.coalesce(1).write.parquet(str(restated_dir / "documents.parquet"))
    shutil.copy(
        f"{src}/embeddings.parquet", str(restated_dir / "embeddings.parquet")
    )
    try:
        os.environ["SPARK_GRAFT_SF_DIR"] = str(restated_dir)
        eng = Engine(
            spark, "demo_curation_incremental", target="daily",
            state_dir=str(tmp_path / "restate_state"),
        )
        eng.project.vars.update({"day_lo": lo, "day_hi": hi})
        results, _ = eng.build()
    finally:
        os.environ["SPARK_GRAFT_SF_DIR"] = src
    assert results.status_counts.get("error", 0) == 0, [
        (r.unique_id, r.message)
        for r in results.results
        if r.status == "error"
    ]
    counts_after = {
        t: spark.table(f"curation_inc_daily.{t}").count() for t in tables
    }
    assert counts_after == counts_before
    kept_after = sorted(
        map(tuple, spark.table("curation_inc_daily.docs_kept")
            .select("doc_id", "text_hash", "text").collect())
    )
    assert kept_after == kept_before  # original text retained, none forked
    assert not any("restated-delivery-v2" in t for _, _, t in kept_after)
    # folded span index still equals the one-shot build
    agg = (
        "SELECT win_hash, CAST(sum(n_occurrences) AS BIGINT) AS n "
        "FROM {}.span_index GROUP BY win_hash"
    )
    one = sorted(map(tuple, spark.sql(agg.format("curation_inc_oneshot")).collect()))
    day = sorted(map(tuple, spark.sql(agg.format("curation_inc_daily")).collect()))
    assert day == one
