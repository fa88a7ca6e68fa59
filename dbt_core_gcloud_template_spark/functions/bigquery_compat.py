"""BigQuery SQL compatibility shims.

The reference template's users write GoogleSQL.  Most of it runs on
Spark unchanged (shared ANSI core); this module registers SQL-defined
session functions for the common BigQuery-isms that don't, so model
SQL lifted from a BigQuery project parses and computes identically:

- SAFE_DIVIDE / SAFE_MULTIPLY / SAFE_ADD / SAFE_SUBTRACT / SAFE_NEGATE
  (NULL on division-by-zero / overflow-ish cases instead of error)
- IFNULL already exists in Spark; COUNTIF -> count_if exists;
  LOGICAL_AND/LOGICAL_OR -> bool_and/bool_or exist (not re-registered)
- TIMESTAMP_TRUNC / DATE_TRUNC argument order: BigQuery writes
  (value, part) where Spark's date_trunc is (part, value) — shimmed as
  BQ_TIMESTAMP_TRUNC to avoid shadowing Spark's builtin
- PARSE_DATE's common '%Y-%m-%d' pattern via BQ_PARSE_DATE_ISO

Registered per-session with ``CREATE OR REPLACE TEMPORARY FUNCTION``
(SQL-body scalar functions — Catalyst inlines them into the plan, so
the shims codegen like hand-written CASE expressions; zero UDF
overhead).

NOT shimmed, deliberately: FARM_FINGERPRINT (a different hash
algorithm — aliasing xxhash64 would silently change persisted values)
and GENERATE_UUID (nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SHIMS = [
    # SAFE_* arithmetic: NULL instead of error/Inf on the edge cases
    """CREATE OR REPLACE TEMPORARY FUNCTION safe_divide(a DOUBLE, b DOUBLE)
       RETURNS DOUBLE
       RETURN CASE WHEN b = 0 OR b IS NULL THEN NULL ELSE a / b END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION safe_multiply(a DOUBLE, b DOUBLE)
       RETURNS DOUBLE
       RETURN CASE WHEN isnan(a * b) OR abs(a * b) = double('inf')
                   THEN NULL ELSE a * b END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION safe_add(a DOUBLE, b DOUBLE)
       RETURNS DOUBLE
       RETURN CASE WHEN isnan(a + b) OR abs(a + b) = double('inf')
                   THEN NULL ELSE a + b END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION safe_subtract(a DOUBLE, b DOUBLE)
       RETURNS DOUBLE
       RETURN CASE WHEN isnan(a - b) OR abs(a - b) = double('inf')
                   THEN NULL ELSE a - b END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION safe_negate(a DOUBLE)
       RETURNS DOUBLE RETURN -a""",
    # BigQuery argument order (value, part); Spark builtin is (part, value)
    """CREATE OR REPLACE TEMPORARY FUNCTION bq_timestamp_trunc(
           ts TIMESTAMP, part STRING)
       RETURNS TIMESTAMP RETURN date_trunc(part, ts)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bq_parse_date_iso(s STRING)
       RETURNS DATE RETURN to_date(s, 'yyyy-MM-dd')""",
]


def register_bigquery_compat(spark: SparkSession) -> None:
    """Install the shim functions into the session (idempotent)."""
    for ddl in _SHIMS:
        spark.sql(ddl)
