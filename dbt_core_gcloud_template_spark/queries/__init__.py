"""Query registry backing ``__spark_entry__.py``.

Each registered query is a pair:
  - a Spark callable ``(spark, sf_dir) -> DataFrame`` (DataFrame-API,
    Catalyst-optimized), and
  - optionally an ANSI-SQL oracle string DuckDB runs on the same parquet
    (views: region nation customer supplier part orders lineitem events
    documents embeddings).

Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).  Aggregates over money
columns go through DECIMAL(18,2) so sums are exact and
order-independent in both engines, then back to DOUBLE for hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# The grading driver value-hashes only the FIRST 50 ``queries()``
# entries, so dict order is exposure: a stable 20-query core (engine
# spine + TPC-H flagships) comes first, followed by the newest /
# riskiest oracle-backed operators (incremental dedup/LSH, semdedup,
# DSIR, BPE, curriculum, multimodal, ANN paths) so they sit inside the
# hashed window instead of the long-green tail.  Everything else keeps
# registration (import) order; tools/verify_local.py still checks all
# 150 regardless of order.
_GATE_PRIORITY: tuple[str, ...] = (
    # -- stable core (20)
    "stg_example", "fct_example", "data_diff_rows", "data_diff_counts",
    "unique_test", "not_null_test", "freshness", "q1_pricing_summary",
    "q3_top_revenue", "q5_region_revenue", "window_topk_orders",
    "set_ops_customers", "scalar_functions", "schema_columns",
    "schema_diff_cols", "dedup_exact", "minhash_signatures",
    "lsh_candidate_pairs", "embedding_cosine_topk", "events_tumbling_1h",
    # -- r6 rotation (30): the r5 cohort (incremental dedup/LSH,
    # semdedup, DSIR, BPE, multimodal, ANN, spans, classifier, planner)
    # went 50/50 green in CORRECTNESS_r05 and rotates OUT to
    # verify_local-only coverage; in come (a) the NINE operators new in
    # r6 (incrementals for every dedup tier, LSH-fed representative,
    # classifier train->infer, bloom tier), (b) the six entries ADVICE
    # flagged as evicted-before-green in r5, and (c) 15 entries that
    # have NEVER had a driver-hashed row (events/zoo/extra/docs
    # families) so every registry entry eventually gets driver-gated
    # at least once across rounds.
    # -- (a) new in r6
    "docs_duplicated_spans_incremental", "neardup_best_representative_lsh",
    "docs_passage_dedup_incremental", "dedup_embedding_cosine_incremental",
    "docs_quality_train_weights", "docs_quality_classifier_trained",
    "docs_despanned_incremental", "embedding_semdedup_incremental",
    "dedup_incremental_exact_bloom",
    # -- (b) r5 evictees (ADVICE: rotate back into the window)
    "simhash", "token_countmin_topk", "ngram_jaccard_pairs",
    "editdist_near_pairs", "simhash_near_pairs", "docs_lm_perplexity",
    # -- (c) never driver-gated
    "events_sessionized", "events_interpolated_6h",
    "events_rolling_7d_users", "events_asof_daily_state",
    "events_retention_cohorts", "events_funnel_daily",
    "window_analytics", "grouping_sets_orders", "orders_rolling_7d",
    "bloom_semi_revenue",
    "orders_daily_anomalies", "lineitem_corr_stats",
    "pivot_priority_by_year", "recursive_supplier_chain",
    "docs_pii_redaction",
)


def _gate_ordered() -> list[str]:
    rest = [n for n in _REGISTRY if n not in _GATE_PRIORITY]
    return [n for n in _GATE_PRIORITY if n in _REGISTRY] + rest


def queries() -> dict[str, QueryFn]:
    return {name: _REGISTRY[name][0] for name in _gate_ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _gate_ordered()
        if _REGISTRY[name][1] is not None
    }


# Populate the registry (import order = display order).
from . import relational  # noqa: E402,F401
from . import tpch_more  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import events_batch  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import extra  # noqa: E402,F401
from . import zoo  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
