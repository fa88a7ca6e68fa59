"""Run-health alerting over emitted artifacts (SURVEY §2 A8).

The reference provisions log-based metrics + alert policies that fire
when job errors/failures exceed 0 in a window
(``infra/90-monitoring.sh:114-145``: cloud_run_job_errors,
cloud_run_job_failures, scheduler errors, BigQuery job errors — all
"count > 0 over 5m" policies).  The engine has no cloud logging
pipeline; its signal source is the artifacts every run already writes
(run_results.json, sources.json).  ``evaluate_alerts`` applies the
same shape of policies to those artifacts and emits alerts.json — the
hook point where a deployment wires PagerDuty/Slack/Cloud Monitoring.

Policies (each mirrors a reference metric):
  node-errors      — any error/fail node result        (job_errors)
  run-failure      — overall run had failures          (job_failures)
  source-freshness — any source stale past its warn/error threshold
  bytes-scanned    — a node's pre-execution input estimate above a
                     threshold (the maximum_bytes_billed observability
                     twin: alert instead of refuse)
  fence-tripped    — a node's skew fence dropped/short-circuited work
                     (per-node ``fences`` records with fenced_groups
                     > 0): the corpus outgrew a max_bucket_size /
                     max_occurrences / max_cluster_size cap, so the
                     run silently under-deduplicated — page a human to
                     re-train lists / raise bands, don't fail the run
  recall-degraded  — a diagnostics stage's reported *recall* metric
                     (per-node ``metrics`` in run_results, written via
                     dbt.record_metric) fell below the ``min_recall``
                     floor: the banding/clustering configuration no
                     longer covers this corpus — retune bands/n_lists
  classifier-degraded — a diagnostics stage's reported *auc* metric
                     fell below the ``min_auc`` floor: the quality
                     classifier no longer separates its classes on
                     this corpus (label drift, stale weights) — the
                     quality-tier twin of recall-degraded, same strict
                     ``auc``/``*_auc`` naming + 0..1 range convention
  drift-degraded   — a diagnostics stage's reported *psi* metric rose
                     ABOVE the ``max_psi`` ceiling: today's snapshot's
                     feature distribution shifted away from the pinned
                     baseline (crawler change, source-mix change,
                     upstream quality regression) — the data-
                     distribution twin of the two floors, a CEILING
                     because for PSI bigger is worse; strict
                     ``psi``/``*_psi`` naming + value >= 0 convention
                     (PSI is unbounded above, 0.25 is the conventional
                     action line)
"""

from __future__ import annotations

import json

from . import arturi


def evaluate_alerts(
    state_dir: str,
    max_input_bytes: int | None = None,
    min_recall: float | None = None,
    min_auc: float | None = None,
    max_psi: float | None = None,
) -> list[dict]:
    """Evaluate alert policies over a state dir's artifacts.

    Missing artifacts are skipped (a freshness-only deployment has no
    run_results).  Returns alert dicts: policy, severity, subject,
    message.
    """
    alerts: list[dict] = []

    rr_path = arturi.join(state_dir, "run_results.json")
    if arturi.exists(rr_path):
        with arturi.open_uri(rr_path) as f:
            rr = json.load(f)
        bad = [
            r for r in rr.get("results", [])
            if r.get("status") in ("error", "fail")
        ]
        for r in bad:
            alerts.append(
                {
                    "policy": "node-errors",
                    "severity": "error",
                    "subject": r["unique_id"],
                    "message": (r.get("message") or "")[:300],
                }
            )
        if bad:
            alerts.append(
                {
                    "policy": "run-failure",
                    "severity": "error",
                    "subject": f"target={rr.get('target')}",
                    "message": f"{len(bad)} failed node(s) in last run",
                }
            )
        if max_input_bytes is not None:
            for r in rr.get("results", []):
                if (r.get("input_bytes") or -1) > max_input_bytes:
                    alerts.append(
                        {
                            "policy": "bytes-scanned",
                            "severity": "warn",
                            "subject": r["unique_id"],
                            "message": (
                                f"input estimate {r['input_bytes']} bytes "
                                f"exceeds threshold {max_input_bytes}"
                            ),
                        }
                    )
        def metric_bound_policy(
            suffix: str,
            bound: float,
            policy: str,
            tail: str,
            ceiling: bool = False,
            hi: float | None = 1.0,
        ) -> None:
            """Shared shape of the metric-threshold policies: a
            diagnostics stage's reported metric beyond ``bound`` warns
            (below it for floors, above it for ceilings).  The name
            match is a strict convention — only ``<suffix>`` or
            ``*_<suffix>`` is a metric the policy may threshold; a
            substring match would also capture counter metrics that
            merely mention the word (e.g. "recall_pairs_checked") and
            threshold a count against a ratio floor — spam or a policy
            that never fires.  Out-of-range values (outside [0, hi];
            ``hi=None`` = unbounded above, the PSI case) are skipped
            for the same reason: not this policy's metric shape, not
            ours."""
            for r in rr.get("results", []):
                for name, value in sorted(
                    (r.get("metrics") or {}).items()
                ):
                    if (
                        (name == suffix or name.endswith(f"_{suffix}"))
                        and value is not None
                        and value >= 0.0
                        and (hi is None or value <= hi)
                        and (value > bound if ceiling else value < bound)
                    ):
                        alerts.append(
                            {
                                "policy": policy,
                                "severity": "warn",
                                "subject": r["unique_id"],
                                "message": (
                                    f"{name}={value} "
                                    + (
                                        f"above the {bound} ceiling"
                                        if ceiling
                                        else f"below the {bound} floor"
                                    )
                                    + f" — {tail}"
                                ),
                            }
                        )

        if min_recall is not None:
            # recall-degraded (r8 verdict #3): a recall below the floor
            # means the banding / clustering configuration silently
            # under-deduplicates the corpus — page a human to retune
            # bands / n_lists, don't fail the run
            metric_bound_policy(
                "recall", min_recall, "recall-degraded",
                "dedup coverage degraded",
            )
        if min_auc is not None:
            # classifier-degraded (r10): the quality-tier twin — an AUC
            # below the floor means the trained classifier stopped
            # separating its classes (label drift, stale weights);
            # page a human to retrain
            metric_bound_policy(
                "auc", min_auc, "classifier-degraded",
                "quality classifier separation degraded",
            )
        if max_psi is not None:
            # drift-degraded (r10): the data-distribution leg — a PSI
            # above the ceiling means today's snapshot drifted away
            # from the pinned baseline; page a human to inspect the
            # feed (and re-baseline deliberately if the shift is real)
            metric_bound_policy(
                "psi", max_psi, "drift-degraded",
                "dataset distribution drifted from the pinned baseline",
                ceiling=True, hi=None,
            )
        for r in rr.get("results", []):
            tripped = [
                fr for fr in (r.get("fences") or [])
                if fr.get("fenced_groups", 0) > 0
            ]
            if tripped:
                detail = "; ".join(
                    f"{fr['operator']}.{fr['fence']}: "
                    f"{fr['fenced_groups']} group(s)"
                    + (
                        f", {fr['fenced_rows']} row(s)"
                        if fr.get("fenced_rows") is not None
                        else ""
                    )
                    for fr in tripped
                )
                alerts.append(
                    {
                        "policy": "fence-tripped",
                        "severity": "warn",
                        "subject": r["unique_id"],
                        "message": f"skew fence dropped work: {detail}"[:300],
                    }
                )

    src_path = arturi.join(state_dir, "sources.json")
    if arturi.exists(src_path):
        with arturi.open_uri(src_path) as f:
            src = json.load(f)
        for name, res in sorted(src.items()):
            status = (res or {}).get("status")
            if status in ("warn", "error"):
                alerts.append(
                    {
                        "policy": "source-freshness",
                        "severity": status,
                        "subject": name,
                        "message": f"source freshness {status}"
                        + (f" (age {res.get('age_seconds')}s)"
                           if res.get("age_seconds") is not None else ""),
                    }
                )

    out_path = arturi.join(state_dir, "alerts.json")
    with arturi.open_uri(out_path, "w") as f:
        json.dump(alerts, f, indent=2)
    return alerts
