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
# entries (183 after the r10 additions) regardless of order.
_GATE_PRIORITY: tuple[str, ...] = (
    # -- stable core, shrunk 20 -> 10 per the r6 verdict (the evicted
    # ten have been driver-green since r1-r2 and stay covered by
    # tools/verify_local.py every session): the engine spine
    # (stg/fct, diff, tests, freshness, schema diff) + TPC-H q1/q5.
    "stg_example", "fct_example", "data_diff_rows", "data_diff_counts",
    "unique_test", "not_null_test", "freshness", "schema_diff_cols",
    "q1_pricing_summary", "q5_region_revenue",
    # -- r11 new/modified (8), the contract the r7 advisor set.  New:
    # snapshot_scd2 (the SCD2 materialization under the value hash —
    # two-delivery close-and-insert replay, same-timestamp/late no-ops,
    # rerun idempotency certified by the hash; the last §2
    # materialization that was pytest-only) and docs_stats_drift_stream
    # (streaming drift — foreachBatch folds additive (feature, bucket)
    # count deltas into stored state with per-batch PSI vs a pinned
    # baseline; the additive fold makes the drained result equal the
    # batch PSI, so the SAME docs_stats_drift oracle gates it).
    # Modified: docs_stats_drift (the source-mix leg moved from open
    # categorical to the pinned SOURCE_DRIFT_VOCAB — new oracle text,
    # new result) and embedding_drift (drift.py's vocab-literal
    # escaping touched the shared oracle generator; re-hashed per the
    # contract); events_stream_sessions, events_stream_followups and
    # events_stream_enriched (the staged-chunk replay harness gained
    # the sentinel-marker-absence assert and the explicit
    # bigint-nanos opt-in); embedding_stream_semdedup_incremental (the
    # drain now threads strict-fence arming + the telemetry collector
    # into the foreachBatch thread and passes max_cluster_size
    # through).
    "snapshot_scd2", "docs_stats_drift_stream",
    "docs_stats_drift", "embedding_drift",
    "events_stream_sessions", "events_stream_followups",
    "events_stream_enriched", "embedding_stream_semdedup_incremental",
    # -- r11 continuation (2): the other two S8 semantics under the
    # hash — the CHECK strategy (null-safe payload comparison, pinned
    # run timestamps, no hard-delete) and hard_deletes='invalidate'
    # (vanished keys close at the pinned now; supersession wins over
    # deletion timing); both replay delivery 2 twice so rerun
    # idempotency is hash-certified.  They take two of the r7 spare
    # slots (docs_tfidf_terms, docs_bm25_search — same fp-fold risk
    # class as corpus_term_entropy, which keeps its slot).
    "snapshot_scd2_check", "snapshot_scd2_invalidate",
    # -- r11 rotation (25): FRESHNESS — the entire r6-stale cohort
    # (per the r10 verdict task #1; includes the eight entries that
    # ceded r10 spare slots).  After r11 no registry entry's latest
    # driver hash is older than r7.
    "bloom_semi_revenue", "docs_lm_perplexity", "docs_pii_redaction",
    "editdist_near_pairs", "events_asof_daily_state",
    "events_funnel_daily", "events_interpolated_6h",
    "events_retention_cohorts", "events_rolling_7d_users",
    "events_sessionized", "events_tumbling_1h", "grouping_sets_orders",
    "lineitem_corr_stats", "orders_daily_anomalies", "orders_rolling_7d",
    "pivot_priority_by_year", "q3_top_revenue",
    "recursive_supplier_chain", "scalar_functions", "schema_columns",
    "set_ops_customers", "simhash", "token_countmin_topk",
    "window_analytics", "window_topk_orders",
    # -- r11 spare slots (5): the riskiest of the r7-stale cohort (35
    # entries, next in the freshness rotation) — a floating-point fold
    # (corpus_term_entropy), the iterative and AQE-shape-dependent
    # graph/dedup paths (neardup_pagerank, dedup_canonical_ids), and
    # the two streaming drains not already re-hashed above
    # (events_stream_tumbling, events_user_totals_stateful).
    "corpus_term_entropy",
    "neardup_pagerank", "dedup_canonical_ids",
    "events_stream_tumbling", "events_user_totals_stateful",
)

# The three registry entries intentionally registered WITHOUT an
# oracle (non-SQL-expressible: k-means lists, in-plan approx-distinct
# error bound, BPE merge fertility).  All three earned their lifetime
# driver row in r8; per the r8 verdict they stay OUT of future windows
# unless their operator changes (embedding_kmeans_lists is in the r9
# window because _nearest_centroid and the descent check changed this
# round).  Everything else in the window must be oracle-backed
# (pinned by tests/test_plans.py).
_ROWS_ONLY: frozenset[str] = frozenset(
    {"embedding_kmeans_lists", "approx_distinct_parts", "docs_bpe_fertility"}
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
