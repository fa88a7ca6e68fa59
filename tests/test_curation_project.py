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
