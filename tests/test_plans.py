"""Physical-plan assertions: the plans that pass correctness at sf0.01
must also be the plans you'd want at 100 TB (broadcast dims, pushdown,
pruning, no cartesian products).  These tests fail if a refactor
silently degrades the plan."""

import contextlib
import io

import pytest


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def qs():
    from dbt_core_gcloud_template_spark.queries import queries

    return queries()


def test_q5_broadcasts_dimensions(spark, sf_dir, qs):
    plan = plan_of(qs["q5_region_revenue"](spark, sf_dir))
    # every dim (customer/supplier/nation/region) must broadcast —
    # shuffling lineitem×dims at 100 TB would dominate the query
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q1_filter_pushdown_and_pruning(spark, sf_dir, qs):
    plan = plan_of(qs["q1_pricing_summary"](spark, sf_dir))
    # date filter reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: untouched wide columns never leave the scan
    assert "l_partkey" not in plan
    assert "l_suppkey" not in plan
    # partial aggregation before the exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_stg_example_reads_three_columns(spark, sf_dir, qs):
    plan = plan_of(qs["stg_example"](spark, sf_dir))
    assert "o_orderkey" in plan and "o_totalprice" in plan
    assert "o_custkey" not in plan and "o_orderpriority" not in plan


def test_minhash_is_map_only(spark, sf_dir, qs):
    plan = plan_of(qs["minhash_signatures"](spark, sf_dir))
    # signature computation must not join or sort; the only exchange
    # allowed is the small-input repartition
    assert "Join" not in plan
    assert "Sort" not in plan.replace("SortAggregate", "")
    # tree nodes render as "Exchange (n)"; details as "(n) Exchange"
    assert plan.count("Exchange (") <= 1


def test_cosine_topk_broadcasts_queries(spark, sf_dir, qs):
    plan = plan_of(qs["embedding_cosine_topk"](spark, sf_dir))
    assert "BroadcastExchange" in plan  # query vectors are the small side


def test_diff_except_plans_as_aggregate_not_cartesian(spark, sf_dir, qs):
    plan = plan_of(qs["data_diff_rows"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_events_window_single_shuffle(spark, sf_dir, qs):
    plan = plan_of(qs["events_tumbling_1h"](spark, sf_dir))
    # tumbling agg: partial agg → single exchange → final agg
    # (count(distinct user_id) legitimately adds one expand+exchange)
    assert plan.count("CartesianProduct") == 0


def test_q4_plans_left_semi_join(spark, sf_dir, qs):
    plan = plan_of(qs["q4_order_priority"](spark, sf_dir))
    # EXISTS must stay a semi-join (no materialized distinct + inner join)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q16_plans_left_anti_join(spark, sf_dir, qs):
    plan = plan_of(qs["q16_supplier_cnt"](spark, sf_dir))
    # NOT IN exclusion must stay an anti-join, not a collected list
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q6_full_pushdown_and_pruning(spark, sf_dir, qs):
    plan = plan_of(qs["q6_revenue_forecast"](spark, sf_dir))
    # all three predicates reach the parquet reader
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    # untouched columns pruned at the scan
    assert "l_partkey" not in plan and "l_orderkey" not in plan


def test_q2_single_window_pass(spark, sf_dir, qs):
    plan = plan_of(qs["q2_cheapest_supplier"](spark, sf_dir))
    # correlated-min rewrite: exactly one window over partkey, no rescan
    assert plan.count("Window (") <= 1
    assert "CartesianProduct" not in plan


def test_exposures_parsed_and_noop(spark, sf_dir, tmp_path):
    """Exposures (reference models/exposures.yml template) become
    metadata-only manifest nodes with resolved deps; build noops them."""
    import os

    from dbt_core_gcloud_template_spark.plans.compiler import compile_project
    from dbt_core_gcloud_template_spark.plans.project import load_project

    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    proj = load_project("demo_project")
    assert [e.name for e in proj.exposures] == ["example_dashboard"]
    man = compile_project(proj, "dev")
    uid = "exposure.demo.example_dashboard"
    assert uid in man.nodes
    node = man.nodes[uid]
    assert node.resource_type == "exposure"
    assert set(node.depends_on) == {
        "model.demo.fct_example",
        "model.demo.fct_events_daily",
    }
    assert node.config["owner"]["email"] == "analytics@example.com"


def test_selection_grammar_graph_operators(spark, sf_dir):
    """dbt selector parity: +name (ancestors), name+ (descendants),
    @name, intersection via comma, union via space, exclusion,
    resource_type: and path: methods."""
    import os

    from dbt_core_gcloud_template_spark.plans.compiler import compile_project
    from dbt_core_gcloud_template_spark.plans.project import load_project

    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    man = compile_project(load_project("demo_project"), "dev")

    stg = "model.demo.stg_example"
    fct = "model.demo.fct_example"

    desc = man.select("stg_example+")
    assert stg in desc and fct in desc

    anc = man.select("+fct_example")
    assert fct in anc and stg in anc and "source.raw.example" in anc
    # ancestors do not include fct's tests or descendants
    assert not any(man.nodes[u].resource_type == "test" and fct in man.nodes[u].depends_on for u in anc)

    # @stg: descendants of stg plus ALL their ancestors (so fct's other
    # upstream deps come in too)
    at = man.select("@stg_example")
    assert desc <= at and anc <= at

    # intersection: models that are descendants of stg AND of type model
    inter = man.select("stg_example+,resource_type:model")
    assert inter == {u for u in desc if man.nodes[u].resource_type == "model"}

    # union via space
    union = man.select("stg_example fct_example")
    assert union == {stg, fct}

    # path: method matches the project-relative file path prefix
    staged = man.select("path:models/staging")
    assert stg in staged and fct not in staged


def test_chunking_is_map_only(spark, sf_dir, qs):
    plan = plan_of(qs["docs_chunked"](spark, sf_dir))
    assert "Join" not in plan
    # only the small-input repartition; chunk expansion is Generate
    assert plan.count("Exchange (") <= 1
    assert "Generate" in plan


def test_tfidf_single_index_shuffle_and_broadcast_stats(spark, sf_dir, qs):
    plan = plan_of(qs["docs_tfidf_terms"](spark, sf_dir))
    # per-term stats (df/idf, corpus scalars) come back via broadcast,
    # never a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_random_projection_no_join_no_agg(spark, sf_dir, qs):
    plan = plan_of(qs["embedding_projection"](spark, sf_dir))
    assert "Join" not in plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    assert plan.count("Exchange (") <= 1  # ensure_parallelism only


def test_perplexity_broadcasts_context_and_vocab(spark, sf_dir, qs):
    plan = plan_of(qs["docs_lm_perplexity"](spark, sf_dir))
    # c1 and vocab are vocabulary-sized aggregates joined via broadcast
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan


def test_source_cap_single_group_shuffle(spark, sf_dir, qs):
    plan = plan_of(qs["docs_source_cap"](spark, sf_dir))
    assert "Window" in plan
    assert "Join" not in plan


def test_private_model_access_enforced(spark, sf_dir, tmp_path):
    """dbt 1.5 governance: access=private models may only be ref'd from
    the same group; cross-group refs fail at compile."""
    import os

    import pytest as _pytest

    from dbt_core_gcloud_template_spark.plans.compiler import (
        CompilerError,
        compile_project,
    )
    from dbt_core_gcloud_template_spark.plans.project import load_project

    root = tmp_path / "gov"
    (root / "models" / "staging").mkdir(parents=True)
    (root / "project.yml").write_text(
        "name: t\nprofile: t\n"
        "groups:\n  - name: core\n  - name: other\n"
    )
    (root / "profiles.yml").write_text(
        "t:\n  target: dev\n  outputs:\n    dev:\n      schema: eng_gov\n      threads: 2\n"
    )
    (root / "models" / "staging" / "src.yml").write_text(
        "sources:\n  - name: raw\n    schema: raw_gov\n    tables:\n"
        "      - name: orders\n        external:\n"
        f"          location: {sf_dir}/orders.parquet\n          format: parquet\n"
    )
    (root / "models" / "staging" / "inner.sql").write_text(
        "{{ config(access='private', group='core') }}\n"
        "select o_orderkey as id from {{ source('raw','orders') }}"
    )
    (root / "models" / "staging" / "same_group.sql").write_text(
        "{{ config(group='core') }}\nselect * from {{ ref('inner') }}"
    )
    proj = load_project(str(root))
    compile_project(proj, "dev")  # same-group ref is fine

    (root / "models" / "staging" / "outsider.sql").write_text(
        "{{ config(group='other') }}\nselect * from {{ ref('inner') }}"
    )
    with _pytest.raises(CompilerError, match="private model"):
        compile_project(load_project(str(root)), "dev")


def test_passage_dedup_single_pass_no_join(spark, sf_dir, qs):
    """First-occurrence detection is a window over the passage hash —
    ONE corpus shuffle, no join (the groupBy-then-join-back shape
    re-executed the generate pipeline and broadcast a corpus-sized
    table)."""
    plan = plan_of(qs["docs_passage_dedup"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Window (") == 1
    # parallelism repartition + window exchange + doc aggregate
    assert plan.count("Exchange (") <= 3


def test_dsir_single_corpus_shuffle_and_broadcast_ratios(spark, sf_dir, qs):
    """DSIR: the ratio table (<=256 rows) must broadcast onto the
    exploded features; a shuffle join there would move the whole
    feature stream twice."""
    plan = plan_of(qs["docs_dsir_weights"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_multimodal_decode_is_map_only(spark, sf_dir, qs):
    """Encode + decode are FUSED into one Arrow stage (r13: the chained
    two-stage form shipped every BMP payload across the JVM boundary
    twice), with no shuffle beyond the parallelism repartition."""
    plan = plan_of(qs["multimodal_decode"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange (") <= 1
    assert plan.count("MapInPandas (") == 1  # one fused encode∘decode pass


def test_canonical_ids_aggregates_pairs_before_docs_join(spark, sf_dir, qs):
    """The r4 rework: pairs aggregate to one min-candidate per member
    BEFORE the docs join; under AQE the aggregated side broadcasts, so
    the executed plan must show a broadcast outer join, never a
    shuffled docs-side groupBy after the join."""
    df = qs["dedup_canonical_ids"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # let AQE finalize
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed and "LeftOuter" in executed


def test_gate_priority_order_contract():
    """The driver value-hashes only the first 50 queries() entries:
    the first 50 must be exactly the curated priority list, every one
    oracle-backed, and queries()/oracle_sql() must agree on order so
    the hashed window covers the newest operators, not the oldest."""
    from dbt_core_gcloud_template_spark.queries import (
        _GATE_PRIORITY,
        oracle_sql,
        queries,
    )

    from dbt_core_gcloud_template_spark.queries import _ROWS_ONLY

    names = list(queries())
    assert len(_GATE_PRIORITY) == 50
    assert names[:50] == list(_GATE_PRIORITY)
    assert len(names) == len(set(names))
    oracles = oracle_sql()
    # Every window entry is oracle-backed except the three declared
    # rows-only entries, which carry in-query invariant columns instead
    # (r7 verdict task #4) and must never silently grow in number.
    for n in names[:50]:
        assert n in oracles or n in _ROWS_ONLY, n
    assert _ROWS_ONLY == {
        "embedding_kmeans_lists",
        "approx_distinct_parts",
        "docs_bpe_fertility",
    }
    assert all(n not in oracles for n in _ROWS_ONLY)
    # rotation policy (r12, per the r11 verdict): lifetime exposure
    # closed at r8, so the window is (a) every query new this round or
    # whose underlying operator/oracle changed in this round's diff,
    # plus (b) FRESHNESS — the entire r7-stale cohort, so that after
    # r12 no entry's latest driver hash is older than r8, plus
    # (c) spare slots on the riskiest r8-stale entries.
    modified_this_round = {
        # new in r12: the insert_overwrite and microbatch incremental
        # strategies under the value hash as multi-delivery replays
        # through the REAL Engine path (queries/materializations.py),
        # and the seed loader (S3) against a VALUES-literal oracle
        "incremental_insert_overwrite", "incremental_microbatch",
        "engine_seed_load",
        # r12 continuation: S9 schema evolution through the real keyed
        # merge — append_new_columns (delivery 2 widens the schema)
        # and sync_all_columns (delivery 2 also DROPS a column)
        "incremental_schema_evolution", "incremental_schema_sync",
        # modified in r12: streaming drift's stored-count writer gained
        # single-file appends + in-drain compaction (fold unchanged)
        "docs_stats_drift_stream",
    }
    stale_r7_cohort = {
        "accepted_values_check", "basket_part_pairs", "corpus_bigrams",
        "correlated_above_avg_customers", "dedup_components",
        "docs_bm25_search", "docs_curation_funnel", "docs_dup_ngrams",
        "docs_dup_rate_by_source", "docs_mixture_weights",
        "docs_repetition", "docs_source_cap", "docs_stratified_sample",
        "docs_tfidf_terms", "docs_weighted_sample", "events_dedup",
        "events_in_session_range", "events_interarrival_stats",
        "events_json_stats", "events_markov_transitions",
        "events_resampled_6h", "events_sliding_1h_15m",
        "lateral_top_orders", "lineitem_key_skew", "neardup_triangles",
        "orders_histogram_quantiles", "orders_mad_outliers",
        "part_revenue_outer", "salted_join_supplier_volume",
        "unpivot_priority_long",
    }
    spare_r8_risky = {
        "events_stream_dedup_incremental",
        "embedding_semdedup_incremental", "embedding_semdedup_fenced",
        "lsh_candidate_pairs",
    }
    for risky in modified_this_round | stale_r7_cohort | spare_r8_risky:
        assert risky in names[:50], risky
