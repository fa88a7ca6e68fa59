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
    # -- stable core, shrunk 20 -> 10 per the r6 verdict (the evicted
    # ten have been driver-green since r1-r2 and stay covered by
    # tools/verify_local.py every session): the engine spine
    # (stg/fct, diff, tests, freshness, schema diff) + TPC-H q1/q5.
    "stg_example", "fct_example", "data_diff_rows", "data_diff_counts",
    "unique_test", "not_null_test", "freshness", "schema_diff_cols",
    "q1_pricing_summary", "q5_region_revenue",
    # -- new in r7: the streaming incremental-dedup tier gets the same
    # oracle treatment as the batch tiers, and the max_cluster_size
    # fence itself (not just the unfenced path) is value-hashed
    "events_stream_dedup_incremental", "embedding_semdedup_fenced",
    # -- r7 rotation (38): the r6 cohort went 50/50 green in
    # CORRECTNESS_r06 and rotates OUT to verify_local-only coverage;
    # in come 38 of the 53 entries that have NEVER had a driver-hashed
    # row (union of CORRECTNESS_r01-r06), prioritizing the graph and
    # retrieval families (highest algorithmic risk), then dedup/docs/
    # corpus, events (incl. the two streaming-replay entries), and the
    # statistics/join-strategy zoo.  The 15 left for r8: 12 low-risk
    # scalar/function-zoo/FK entries + the 3 rows-only entries
    # (embedding_kmeans_lists, approx_distinct_parts,
    # docs_bpe_fertility) that would waste a hashed slot.
    # graph + retrieval
    "dedup_components", "neardup_pagerank", "neardup_triangles",
    "docs_bm25_search", "docs_tfidf_terms",
    # dedup / docs / corpus
    "dedup_canonical_ids", "docs_dup_ngrams", "docs_dup_ngrams_capped",
    "docs_dup_rate_by_source", "docs_curation_funnel", "docs_repetition",
    "docs_chunked", "docs_packed_sequences", "docs_stratified_sample",
    "docs_weighted_sample", "docs_mixture_weights", "docs_source_cap",
    "corpus_bigrams", "corpus_term_entropy",
    # events (batch + streaming replay + stateful)
    "events_dedup", "events_resampled_6h", "events_sliding_1h_15m",
    "events_markov_transitions", "events_interarrival_stats",
    "events_json_stats", "events_in_session_range",
    "events_stream_tumbling", "events_user_totals_stateful",
    # relational / statistics / join-strategy zoo
    "lateral_top_orders", "correlated_above_avg_customers",
    "basket_part_pairs", "salted_join_supplier_volume",
    "lineitem_key_skew", "orders_histogram_quantiles",
    "orders_mad_outliers", "part_revenue_outer", "unpivot_priority_long",
    "accepted_values_check",
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
