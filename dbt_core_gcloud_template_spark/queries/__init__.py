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


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


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
