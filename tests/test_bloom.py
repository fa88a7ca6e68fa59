"""Bloom semi-join reduction (operators/bloom.py): exactness (no false
negatives ever), real pruning on the fact side, and join-type guards."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators.bloom import (
    bloom_filter_words,
    bloom_prefilter,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def facts_dim(spark):
    facts = spark.createDataFrame(
        [Row(k=i % 1000, v=float(i)) for i in range(5000)]
    ).repartition(8)
    dim = spark.createDataFrame(
        [Row(dk=i, name=f"d{i}") for i in range(0, 1000, 50)]  # 20 keys
    )
    return facts, dim


def test_semi_join_matches_plain_join(spark, facts_dim):
    facts, dim = facts_dim
    got = bloom_semi_join(facts, dim, "k", "dk", n_bits=1 << 12)
    want = facts.join(dim, facts.k == dim.dk)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_no_false_negatives_even_with_tiny_filter(spark, facts_dim):
    facts, dim = facts_dim
    # 64 bits for 20 keys: huge FP rate, but every true match must survive
    words = bloom_filter_words(dim, "dk", n_bits=64, k=2)
    kept = bloom_prefilter(facts, "k", words, n_bits=64, k=2)
    true_keys = {r["dk"] for r in dim.collect()}
    kept_keys = {r["k"] for r in kept.collect()}
    assert true_keys <= kept_keys


def test_prefilter_actually_prunes(spark, facts_dim):
    facts, dim = facts_dim
    words = bloom_filter_words(dim, "dk", n_bits=1 << 14, k=5)
    kept = bloom_prefilter(facts, "k", words, n_bits=1 << 14, k=5)
    n_kept, n_total = kept.count(), facts.count()
    n_match = facts.join(dim, facts.k == dim.dk, "left_semi").count()
    assert n_match <= n_kept < n_total
    # 20/1000 keys selected; at m=16384,k=5 the FP rate is ~0 here
    assert n_kept <= n_match * 1.05 + 50


def test_bitmap_word_count_and_validation(spark, facts_dim):
    _, dim = facts_dim
    words = bloom_filter_words(dim, "dk", n_bits=1 << 10, k=3)
    assert len(words) == (1 << 10) // 64
    assert any(w != 0 for w in words)
    with pytest.raises(ValueError):
        bloom_filter_words(dim, "dk", n_bits=100)  # not a multiple of 64


def test_outer_join_rejected(spark, facts_dim):
    facts, dim = facts_dim
    with pytest.raises(ValueError):
        bloom_semi_join(facts, dim, "k", "dk", how="left")


def test_left_semi_supported(spark, facts_dim):
    facts, dim = facts_dim
    got = bloom_semi_join(facts, dim, "k", "dk", how="left_semi")
    want = facts.join(dim, facts.k == dim.dk, "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_probe_stays_jvm_side(spark, facts_dim):
    """The bloom probe must compile into the scan stage (codegen
    forall over the broadcast bitmap) — no Python eval in the plan."""
    facts, dim = facts_dim
    words = bloom_filter_words(dim, "dk", n_bits=1 << 12, k=4)
    kept = bloom_prefilter(facts, "k", words, n_bits=1 << 12, k=4)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
