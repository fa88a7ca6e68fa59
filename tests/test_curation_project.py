"""End-to-end build of the demo_curation project: the engine DAG
running the LLM-corpus curation operators (quality gate -> exact dedup
-> MinHash-LSH near-dup canonicalization -> global shuffle shards ->
mixture stats) against the sf0.001 documents testdata."""

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
    assert results.status_counts["success"] == 7  # 1 view + 5 tables + 1 seedless DAG
    assert results.status_counts["pass"] == 9  # schema tests + retention unit test


def test_curation_funnel_monotone(curation, spark):
    raw = spark.table("curation_dev.stg_documents").count()
    kept = spark.table("curation_dev.docs_kept").count()
    shards = spark.table("curation_dev.corpus_shards").count()
    assert raw >= kept >= shards > 0
    # exact dedup keeps one row per distinct text among survivors
    texts = spark.table("curation_dev.docs_kept").select("text").distinct().count()
    assert texts == kept


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
