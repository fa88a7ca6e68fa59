"""Generic schema tests + source freshness (SURVEY.md §2.4 A4-A6).

dbt's generic tests compile to SQL returning *violating rows*; a test
fails when that set is non-empty.  At 100 TB we never materialize the
violations — each test is an aggregate with an early ``limit`` so
Catalyst can short-circuit (SURVEY §7.7).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class TestResult:
    name: str
    status: str  # pass | fail | error
    failures: int = 0
    message: str = ""
    violations: DataFrame | None = None  # set on fail (store_failures sink)


def unique_violations(df: DataFrame, column: str) -> DataFrame:
    """Duplicated key values with their counts (empty ⇒ pass)."""
    return (
        df.groupBy(column).agg(F.count("*").alias("n_records")).filter(F.col("n_records") > 1)
    )


def unique_test(df: DataFrame, column: str) -> int:
    """Count of duplicated key values (0 ⇒ pass).  Short-circuits via
    limit(1)-style aggregate: only the existence matters."""
    return unique_violations(df, column).limit(1000).count()


def not_null_violations(df: DataFrame, column: str) -> DataFrame:
    return df.filter(F.col(column).isNull())


def not_null_test(df: DataFrame, column: str) -> int:
    return not_null_violations(df, column).limit(1000).count()


def accepted_values_violations(
    df: DataFrame, column: str, values: list[Any]
) -> DataFrame:
    return df.filter(~F.col(column).isin(values) | F.col(column).isNull())


def accepted_values_test(df: DataFrame, column: str, values: list[Any]) -> int:
    return accepted_values_violations(df, column, values).limit(1000).count()


def relationships_violations(
    df: DataFrame, column: str, to_df: DataFrame, to_field: str
) -> DataFrame:
    """FK test: values in df.column missing from to_df.to_field."""
    keys = to_df.select(F.col(to_field).alias(column)).distinct()
    return (
        df.select(column)
        .filter(F.col(column).isNotNull())
        .join(F.broadcast(keys), column, "left_anti")
    )


def relationships_test(
    df: DataFrame, column: str, to_df: DataFrame, to_field: str
) -> int:
    return relationships_violations(df, column, to_df, to_field).limit(1000).count()


def run_generic_test(
    spark: SparkSession,
    test_name: str,
    relation_fqn: str,
    column: str,
    params: dict[str, Any],
    resolve_relation=None,
) -> TestResult:
    df = spark.table(relation_fqn)
    label = f"{test_name}_{relation_fqn}_{column}"
    violations: DataFrame | None = None
    try:
        if test_name == "unique":
            violations = unique_violations(df, column)
            failures = violations.limit(1000).count()
        elif test_name == "not_null":
            violations = not_null_violations(df, column)
            failures = violations.limit(1000).count()
        elif test_name == "accepted_values":
            violations = accepted_values_violations(df, column, params.get("values", []))
            failures = violations.limit(1000).count()
        elif test_name == "relationships":
            to_rel = params["to"]
            if resolve_relation is not None:
                to_rel = resolve_relation(to_rel)
            violations = relationships_violations(
                df, column, spark.table(to_rel), params["field"]
            )
            failures = violations.limit(1000).count()
        elif test_name == "equal_rowcount":
            other = params["compare_model"]
            if resolve_relation is not None:
                other = resolve_relation(other)
            failures = equal_rowcount_test(df, spark.table(other))
        elif test_name == "unique_combination_of_columns":
            violations = unique_combination_violations(
                df, params["combination_of_columns"]
            )
            failures = violations.limit(1000).count()
        elif test_name == "expression_is_true":
            # dbt_utils.expression_is_true: rows where the expression is
            # NOT satisfied (NULL counts as a violation, like dbt's SQL)
            expr = params["expression"]
            scope = df.filter(params["where"]) if params.get("where") else df
            violations = scope.filter(~F.coalesce(F.expr(expr), F.lit(False)))
            failures = violations.limit(1000).count()
        elif test_name == "not_accepted_values":
            violations = df.filter(F.col(column).isin(params.get("values", [])))
            failures = violations.limit(1000).count()
        elif test_name == "recency":
            # dbt_utils.recency: fail when max(field) is older than the
            # interval — a model-level freshness check
            period = params.get("period", "day")
            n = int(params.get("interval", 1))
            row = df.agg(F.max(F.col(params.get("field", column))).alias("m")).collect()[0]
            threshold_expr = F.expr(f"current_timestamp() - INTERVAL {n} {period}")
            stale = (
                row.m is None
                or spark.range(1)
                .select((F.lit(row.m).cast("timestamp") < threshold_expr).alias("s"))
                .collect()[0]
                .s
            )
            failures = 1 if stale else 0
        else:
            return TestResult(label, "error", message=f"unknown test {test_name}")
    except Exception as e:  # noqa: BLE001
        return TestResult(label, "error", message=str(e)[:500])
    return TestResult(
        label,
        "pass" if failures == 0 else "fail",
        failures=failures,
        violations=violations if failures else None,
    )


def _threshold_met(cond: str, failures: int) -> bool:
    """Evaluate a dbt warn_if/error_if condition string ('!=0', '>5',
    '>=10', ...) against the failure count."""
    import re

    m = re.fullmatch(r"\s*(>=|<=|!=|==|>|<|=)\s*(\d+)\s*", str(cond))
    if not m:
        raise ValueError(f"bad test threshold {cond!r}")
    op, n = m.group(1), int(m.group(2))
    return {
        ">": failures > n,
        ">=": failures >= n,
        "<": failures < n,
        "<=": failures <= n,
        "!=": failures != n,
        "==": failures == n,
        "=": failures == n,
    }[op]


def threshold_status(
    failures: int,
    severity: str = "error",
    warn_if: str = "!=0",
    error_if: str = "!=0",
) -> str:
    """dbt severity semantics: severity=error checks error_if first
    (fail), then warn_if (warn); severity=warn only ever warns."""
    if severity.lower() == "error" and _threshold_met(error_if, failures):
        return "fail"
    if _threshold_met(warn_if, failures):
        return "warn"
    return "pass"


def fused_violation_expr(
    test_name: str, column: str | None, params: dict[str, Any]
) -> Column | None:
    """Aggregate expression that is >0 iff the test has violations, or
    None when the test cannot be fused (touches a second relation).

    Used by the runner's optimistic fused gate: all single-relation
    tests on one table collapse into ONE aggregate scan (at 100 TB, N
    tests = N full scans otherwise).  The exact-violation path only runs
    when this signal fires, so pass results are byte-identical.

    ``count(*) - count_distinct(struct(cols))`` matches the groupBy
    HAVING count>1 semantics exactly, including NULL keys: a struct
    with NULL fields is itself non-NULL, so count_distinct counts the
    NULL group once, and any group of n>=2 contributes n-1.
    """
    if test_name == "unique" and column:
        return F.count(F.lit(1)) - F.count_distinct(F.struct(F.col(column)))
    if test_name == "not_null" and column:
        return F.sum(F.col(column).isNull().cast("long"))
    if test_name == "accepted_values" and column:
        bad = ~F.col(column).isin(params.get("values", [])) | F.col(column).isNull()
        return F.sum(bad.cast("long"))
    if test_name == "unique_combination_of_columns":
        cols = params.get("combination_of_columns") or []
        if cols:
            return F.count(F.lit(1)) - F.count_distinct(
                F.struct(*[F.col(c) for c in cols])
            )
    if test_name == "expression_is_true" and params.get("expression"):
        bad = ~F.coalesce(F.expr(params["expression"]), F.lit(False))
        if params.get("where"):
            bad = bad & F.coalesce(F.expr(params["where"]), F.lit(False))
        return F.sum(bad.cast("long"))
    if test_name == "not_accepted_values" and column:
        return F.sum(F.col(column).isin(params.get("values", [])).cast("long"))
    return None


# -- dbt_utils-style model-level tests (X7; packages.yml:1-3 declares
# dbt-labs/dbt_utils — the commonly used test macros, reimplemented) ---------


def equal_rowcount_test(df: DataFrame, other: DataFrame) -> int:
    """dbt_utils.equal_rowcount: |count(a) - count(b)| (0 ⇒ pass)."""
    return abs(df.count() - other.count())


def unique_combination_violations(df: DataFrame, columns: list[str]) -> DataFrame:
    return (
        df.groupBy(*columns)
        .agg(F.count("*").alias("n_records"))
        .filter(F.col("n_records") > 1)
    )


def unique_combination_test(df: DataFrame, columns: list[str]) -> int:
    """dbt_utils.unique_combination_of_columns."""
    return unique_combination_violations(df, columns).limit(1000).count()


# -- source freshness (A6; reference src_example.yml:9-13) -------------------

_PERIOD_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


def freshness_check(
    spark: SparkSession,
    relation_fqn: str,
    loaded_at_field: str,
    warn_after: dict[str, Any] | None,
    error_after: dict[str, Any] | None,
    now: datetime | None = None,
    filter_sql: str | None = None,
) -> dict[str, Any]:
    """max(loaded_at) vs now against warn/error thresholds.

    ``filter_sql`` is dbt's source-freshness `filter` config: it scopes
    the max() scan (at 100 TB, typically a partition predicate so the
    check reads one partition, not all history).

    Returns the reference's sources.json per-source shape:
    {max_loaded_at, age_seconds, status}.
    """
    df = spark.table(relation_fqn)
    if filter_sql:
        df = df.filter(filter_sql)
    row = (
        df.agg(F.max(F.col(loaded_at_field).cast("timestamp")).alias("m"))
        .collect()[0]
    )
    max_loaded = row["m"]
    now = now or datetime.now(timezone.utc)
    if max_loaded is None:
        return {"max_loaded_at": None, "age_seconds": None, "status": "error"}
    if max_loaded.tzinfo is None:
        max_loaded = max_loaded.replace(tzinfo=timezone.utc)
    age = (now - max_loaded).total_seconds()

    def _threshold(spec: dict[str, Any] | None) -> float | None:
        if not spec:
            return None
        return spec["count"] * _PERIOD_SECONDS[spec["period"]]

    warn_s, err_s = _threshold(warn_after), _threshold(error_after)
    status = "pass"
    if err_s is not None and age > err_s:
        status = "error"
    elif warn_s is not None and age > warn_s:
        status = "warn"
    return {
        "max_loaded_at": max_loaded.isoformat(),
        "age_seconds": age,
        "status": status,
    }
