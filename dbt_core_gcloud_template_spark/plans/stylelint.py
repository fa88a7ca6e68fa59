"""SQL style rules for ``engine lint`` — the sqlfluff-style-layer
analog of the reference's CI gate (reference ``.sqlfluff:1-8`` sets
``max_line_length = 120`` over the BigQuery dialect + dbt templater;
``.github/workflows/ci.yml:14-36`` enforces it on every PR).

Rules run on the RAW model text (what the user wrote, pre-Jinja) and
are configured by a ``lint:`` section in project.yml::

    lint:
      max_line_length: 120        # 0/None disables   (sqlfluff L016)
      keyword_case: consistent    # upper|lower|consistent|off (L010)
      trailing_whitespace: true   #                     (L001)

All style findings carry ``severity: warning`` — they never fail a
build, mirroring how the reference keeps sqlfluff in CI rather than
in the runner.
"""

from __future__ import annotations

import re
from typing import Any

# The keyword set checked for case consistency: top-level clause words
# only (what sqlfluff's capitalisation rule flags in practice) — NOT
# every reserved word, so identifiers like a column named `left` in
# backticks never trip it.
_KEYWORDS = (
    "select from where group by order having join inner left right "
    "full outer cross on as and or not in exists union all except "
    "intersect case when then else end distinct limit with over "
    "partition between like is null cast"
).split()
_KEYWORD_RE = re.compile(
    r"\b(" + "|".join(_KEYWORDS) + r")\b", re.IGNORECASE
)

# Regions style rules must never look inside: Jinja tags/expressions/
# comments, SQL comments, and string literals.
_MASK_RE = re.compile(
    r"""\{\{.*?\}\}|\{%.*?%\}|\{\#.*?\#\}   # jinja
      | --[^\n]*                            # line comment
      | /\*.*?\*/                           # block comment
      | '(?:[^'\\]|\\.)*'                   # single-quoted string
      | "(?:[^"\\]|\\.)*"                   # double-quoted string (Spark
                                            # SQL default: a literal)
      | `[^`]*`                             # backtick identifier
    """,
    re.DOTALL | re.VERBOSE,
)


def _mask(text: str) -> str:
    """Replace non-SQL regions with spaces, preserving offsets/lines."""

    def blank(m: re.Match) -> str:
        return re.sub(r"[^\n]", " ", m.group(0))

    return _MASK_RE.sub(blank, text)


def default_rules() -> dict[str, Any]:
    return {
        "max_line_length": 120,
        "keyword_case": "consistent",
        "trailing_whitespace": True,
    }


def style_findings(
    raw_sql: str, node: str, rules: dict[str, Any]
) -> list[dict[str, str]]:
    """Apply the configured style rules to one model's raw SQL."""
    conf = {**default_rules(), **(rules or {})}
    findings: list[dict[str, str]] = []
    lines = raw_sql.split("\n")

    max_len = conf.get("max_line_length") or 0
    if max_len:
        for i, line in enumerate(lines, 1):
            if len(line) > max_len:
                findings.append(
                    {
                        "node": node,
                        "rule": "max-line-length",
                        "severity": "warning",
                        "message": f"line {i} is {len(line)} chars "
                                   f"(limit {max_len})",
                    }
                )

    if conf.get("trailing_whitespace", True):
        bad = [i for i, line in enumerate(lines, 1) if line != line.rstrip()]
        if bad:
            shown = ", ".join(str(i) for i in bad[:5])
            more = f" (+{len(bad) - 5} more)" if len(bad) > 5 else ""
            findings.append(
                {
                    "node": node,
                    "rule": "trailing-whitespace",
                    "severity": "warning",
                    "message": f"trailing whitespace on line(s) {shown}{more}",
                }
            )

    policy = (conf.get("keyword_case") or "off").lower()
    if policy in ("upper", "lower", "consistent"):
        masked = _mask(raw_sql)
        words = [m.group(0) for m in _KEYWORD_RE.finditer(masked)]
        # mixed-case single words (SeLeCt) violate every policy
        cased = [
            w for w in words if w == w.upper() or w == w.lower()
        ]
        n_upper = sum(1 for w in cased if w == w.upper())
        n_lower = len(cased) - n_upper
        mixed = len(words) - len(cased)
        if policy == "consistent":
            bad = min(n_upper, n_lower) + mixed
            want = "upper" if n_upper >= n_lower else "lower"
        else:
            bad = (n_lower if policy == "upper" else n_upper) + mixed
            want = policy
        if bad:
            findings.append(
                {
                    "node": node,
                    "rule": "keyword-case",
                    "severity": "warning",
                    "message": f"{bad} keyword(s) not {want}-case "
                               f"(policy: {policy})",
                }
            )
    return findings
