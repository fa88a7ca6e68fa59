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
  their member rows, and the engine writes the records into
  ``run_results.json`` next to the node's status.

What an armed fence costs, honestly:

- **Bucket-tier sites** (LSH band buckets, sign-bucket joins, the
  SemDeDup cluster-size fence) pass their grouped frame through
  :func:`pin_if_armed` first, so the telemetry aggregate and the
  downstream fence filter both read ONE materialized computation —
  arming the collector adds the localCheckpoint write/read of the
  grouped frame, not a second upstream pass.
- **Window-tier sites** (the ``max_occurrences`` fences in the
  span/passage families) enforce the cap inside the main job's
  WindowExec; their telemetry frame is a separate aggregate branch
  whose input re-enumerates the corpus windows.  Arming the
  collector there adds ONE extra pass over the enumerated windows
  per fence site — pinning the exploded corpus to avoid it would
  materialize every k-gram, which costs more than the pass.  Each
  such operator's docstring repeats this.

Collectors are thread-local: the engine executes DAG nodes on a
thread pool and each node's operator calls happen on its own worker
thread, so records can't bleed between concurrently-running nodes.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "FenceTelemetry",
    "active",
    "pin_if_armed",
    "record_fence",
    "record_metric",
]

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
        # named scalar metrics (r8 verdict #3): diagnostics stages
        # (recall/precision evals) report through the same per-node
        # channel as the fences, landing in run_results next to them.
        # Values are Optional by contract: record_metric(None) stores a
        # null (a diagnostic that could not produce a number this run
        # is still a reported metric — consumers like the monitor's
        # recall policy must guard it).
        self.metrics: dict[str, float | None] = {}

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


def pin_if_armed(df: DataFrame) -> DataFrame:
    """Materialize ``df`` (eager localCheckpoint) when a collector is
    active, so the telemetry aggregate and the downstream fence filter
    share one computation instead of each re-running the upstream
    pipeline.  No collector ⇒ returns ``df`` untouched — the
    driver/bench path keeps its plan byte-identical.  Call this on the
    grouped frame that BOTH consumers derive from, not on the fenced
    subset (pinning the subset still leaves the main job recomputing
    the parent)."""
    if active() is None:
        return df
    return df.localCheckpoint(eager=True)


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


def record_metric(name: str, value) -> None:
    """Report a named scalar metric (a recall/precision number, a
    tuning statistic) on the current node's collector — the engine
    writes it into that node's ``metrics`` dict in run_results.json,
    where ``engine monitor`` alert policies can threshold it exactly
    like the fence records.  No-op without an active collector, so
    diagnostics code may call this unconditionally.  ``value=None`` is
    stored as a null (see :class:`FenceTelemetry.metrics`) — consumers
    must treat metric values as ``float | None``."""
    collector = active()
    if collector is None:
        return
    collector.metrics[str(name)] = (
        float(value) if value is not None else None
    )
