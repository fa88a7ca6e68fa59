"""Markdown report rendering for diff results — the PR-comment stage.

Reference parity: ``scripts/pr_data_diff.sh:80-118`` assembles the
``SUMMARY|`` lines into a markdown table posted as the PR comment, and
``scripts/pr_schema_diff.sh:178-305`` renders the schema-drift table.
The engine emits the same parseable ``SUMMARY|`` lines (E14); this
module is the formatter that turns structured diff results into the
same table shapes (headers and columns mirror the reference scripts so
downstream tooling/reviewers see an identical comment).

Pure string formatting over already-computed results — no Spark work.
"""

from __future__ import annotations

from .diff import DiffResult
from .schema_diff import SchemaDiff


def _status(r: DiffResult) -> str:
    if r.status == "NEW_MODEL":
        return "🆕 New Model"
    if r.dev_not_in_prod == 0 and r.prod_not_in_dev == 0:
        return "✅ Unchanged"
    return "📊 Updated"


def data_diff_markdown(
    results: list[DiffResult], generated_at: str | None = None
) -> str:
    """Render data-diff results to the pr_data_diff.sh:83-118 comment
    shape: one table row per model, counts right-aligned, NEW_MODEL
    rows N/A'd."""
    lines = ["# dbt Data Diff Summary", ""]
    if generated_at:
        lines += [f"_Generated: {generated_at}_", ""]
    lines += [
        "| Model | Dev Rows | Prod Rows | Dev-Not-In-Prod | Prod-Not-In-Dev | Status |",
        "|---|---:|---:|---:|---:|---:|",
    ]
    for r in results:
        if r.status == "NEW_MODEL":
            lines.append(f"| {r.table} | {r.dev_count} | N/A | N/A | N/A | {_status(r)} |")
        else:
            lines.append(
                f"| {r.table} | {r.dev_count} | {r.prod_count} "
                f"| {r.dev_not_in_prod} | {r.prod_not_in_dev} | {_status(r)} |"
            )
    return "\n".join(lines) + "\n"


def schema_diff_markdown(
    diffs: list[tuple[str, SchemaDiff | None, bool]],
    generated_at: str | None = None,
) -> str:
    """Render schema-diff results to the pr_schema_diff.sh:178-305
    comment shape.

    ``diffs``: (model, SchemaDiff or None for a new model, moved) —
    ``moved`` mirrors the reference's fqn-movement check (MOVED when
    the relation's dev fqn differs from prod's).
    """
    lines = ["# dbt Schema Diff Summary", ""]
    if generated_at:
        lines += [f"_Generated: {generated_at}_", ""]
    lines += [
        "| Model | Status | Moved | Type Change | +Cols | -Cols | Changed |",
        "|---|---|---|---|---:|---:|---:|",
    ]
    details: list[str] = []
    for model, d, moved in diffs:
        moved_cell = "🔀 MOVED" if moved else "UNCHANGED"
        if d is None:
            lines.append(f"| {model} | 🆕 New Model | {moved_cell} |  | 0 | 0 | 0 |")
            continue
        changed = len(d.type_changed) + len(d.nullability_changed)
        status = "✅ Clean" if d.is_clean and not moved else "⚠️ Drift"
        type_cell = "yes" if d.type_changed else ""
        lines.append(
            f"| {model} | {status} | {moved_cell} | {type_cell} "
            f"| {len(d.added)} | {len(d.removed)} | {changed} |"
        )
        if not d.is_clean:
            details.append(f"## {model}")
            for c in d.added:
                details.append(f"- ➕ added column `{c}`")
            for c in d.removed:
                details.append(f"- ➖ removed column `{c}`")
            for c, dev_t, prod_t in d.type_changed:
                details.append(f"- 🔁 `{c}`: {prod_t} → {dev_t}")
            for c, dev_n, prod_n in d.nullability_changed:
                details.append(
                    f"- ❗ `{c}`: nullable {prod_n} → {dev_n}"
                )
            details.append("")
    out = "\n".join(lines)
    if details:
        out += "\n\n" + "\n".join(details)
    return out + "\n"
