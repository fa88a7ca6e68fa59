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
# entries (174 after the r9 additions) regardless of order.
_GATE_PRIORITY: tuple[str, ...] = (
    # -- stable core, shrunk 20 -> 10 per the r6 verdict (the evicted
    # ten have been driver-green since r1-r2 and stay covered by
    # tools/verify_local.py every session): the engine spine
    # (stg/fct, diff, tests, freshness, schema diff) + TPC-H q1/q5.
    "stg_example", "fct_example", "data_diff_rows", "data_diff_counts",
    "unique_test", "not_null_test", "freshness", "schema_diff_cols",
    "q1_pricing_summary", "q5_region_revenue",
    # -- r9 rotation, part 1 (8): new-this-round + modified-operator
    # queries (the contract the r7 advisor set).  New: the trained-
    # codebook SemDeDup (kmeans_fit_replayable), the strict-profile
    # parity gate, and the retrieval recall eval completing the
    # diagnostic triad.  Modified: operators/chunking.py's per-group
    # hot/cold packing routing (docs_packed_sequences, docs_chunked);
    # the kmeans assignment/tolerance changes (_nearest_centroid
    # round_dp param + scaled descent slack) behind the rows-only
    # embedding_kmeans_lists; and the two recall evals whose bodies
    # moved to operator form for the DAG diagnostics stages
    # (lsh_recall_eval, semdedup_recall_eval — plan-identical
    # refactors, re-hashed anyway per the contract).
    "embedding_semdedup_trained", "lsh_candidate_pairs_strict",
    "ann_recall_eval",
    "docs_packed_sequences", "docs_chunked", "embedding_kmeans_lists",
    "lsh_recall_eval", "semdedup_recall_eval",
    # -- r9 rotation, part 2 (32): with lifetime exposure complete at
    # r8 (171/171), the window's job is now FRESHNESS — this is the
    # entire <=r4 cohort (stalest first: multimodal_metadata and
    # docs_normalized last hashed r2, embedding_lsh_buckets r3, the
    # rest r4 — TPC-H flagships, the docs text-analysis ladder, and
    # set/window zoo entries whose files later fence/telemetry
    # refactors touched).  After r9 no registry entry's latest driver
    # hash is older than r5.
    "multimodal_metadata", "docs_normalized", "embedding_lsh_buckets",
    "rollup_customer_counts", "q2_cheapest_supplier", "q4_order_priority",
    "q6_revenue_forecast", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_important_parts",
    "q12_late_priority", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive_rev", "q20_promotion_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers", "cube_order_stats",
    "docs_token_stats", "docs_quality", "docs_lang_id", "docs_fingerprint",
    "set_ops_all", "demo_bucket_stats", "orders_monthly_backlog",
    "orders_window_zoo",
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
