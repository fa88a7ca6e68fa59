"""Fence telemetry — the "no silent caps" rule, made observable.

Every skew fence in the dedup/similarity ladder (``max_bucket_size``
on the LSH and sign-bucket joins, ``max_occurrences`` on the
span/passage window indexes, ``max_cluster_size`` on the SemDeDup
cluster join) SHORT-CIRCUITS work: an over-cap group is dropped from
the candidate join and its members are conservatively kept.  That is
the right 100 TB behavior — one degenerate bucket must not hold a
1000-executor job hostage — but a production corpus that trips a
fence must be VISIBLE, or "covered everything" silently becomes
"covered everything except the boilerplate that mattered".

This module is the reporting channel.  It is deliberately passive:

- When no collector is active (the default — every registry query,
  the bench, the driver), ``record_fence`` is a no-op that costs one
  attribute lookup; the operators' plans are unchanged and no extra
  Spark job runs.
- When a collector IS active (the engine runner opens one around
  each node), ``record_fence`` EAGERLY counts the fenced groups and
  their member rows — one tiny aggregate job per tripped-fence site,
  bounded by the number of over-cap groups (the same aggregate the
  fence itself computes, plus a count) — and the engine writes the
  records into ``run_results.json`` next to the node's status.

Collectors are thread-local: the engine executes DAG nodes on a
thread pool and each node's operator calls happen on its own worker
thread, so records can't bleed between concurrently-running nodes.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["FenceTelemetry", "active", "record_fence"]

_tls = threading.local()


class FenceTelemetry:
    """Context manager collecting fence records on the current thread.

    >>> with FenceTelemetry() as ft:
    ...     semdedup(emb, "id", "vec", max_cluster_size=10_000)
    >>> ft.records
    [{"operator": "semdedup", "fence": "max_cluster_size",
      "fenced_groups": 1, "fenced_rows": 48213}]
    """

    def __init__(self) -> None:
        self.records: list[dict] = []

    def __enter__(self) -> "FenceTelemetry":
        stack = getattr(_tls, "stack", None)
        if stack is None:
            stack = _tls.stack = []
        stack.append(self)
        return self

    def __exit__(self, *exc) -> None:
        _tls.stack.pop()


def active() -> FenceTelemetry | None:
    stack = getattr(_tls, "stack", None)
    return stack[-1] if stack else None


def record_fence(
    operator: str,
    fence: str,
    fenced_groups: DataFrame,
    rows_col: str | None = None,
) -> None:
    """Report a fence site.  ``fenced_groups`` is the (small) frame of
    over-cap group keys the fence is about to drop — one row per
    fenced group, with ``rows_col`` naming its member-count column
    when the site has one.  No-op unless a collector is active, so
    fence sites may call this unconditionally."""
    collector = active()
    if collector is None:
        return
    aggs = [F.count("*").alias("_groups")]
    if rows_col is not None:
        aggs.append(
            F.coalesce(F.sum(rows_col), F.lit(0)).cast("bigint").alias("_rows")
        )
    row = fenced_groups.agg(*aggs).first()
    rec = {
        "operator": operator,
        "fence": fence,
        "fenced_groups": int(row["_groups"]),
    }
    if rows_col is not None:
        rec["fenced_rows"] = int(row["_rows"])
    collector.records.append(rec)
