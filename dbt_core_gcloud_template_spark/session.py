"""SparkSession bootstrap.

Defaults chosen for BigQuery-parity correctness and 100 TB-scale habits:

- ``spark.sql.session.timeZone=UTC``: BigQuery TIMESTAMP is always UTC
  (SURVEY.md §7.5); every timestamp comparison against the oracle
  assumes this.
- AQE on (+ coalesce partitions + skew join): at scale the static
  shuffle-partition count is always wrong for somebody; AQE re-plans
  from runtime stats.
- ``spark.sql.shuffle.partitions``: sized for the local test harness via
  ``SPARK_GRAFT_CPUS``; on a real cluster AQE coalescing makes the
  initial number a ceiling, not a commitment.
- Arrow enabled: every Pandas-UDF boundary (multimodal, text ops) is
  Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "dbt-core-gcloud-template-spark",
    master: str | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with engine defaults applied."""
    cpus = cpu_count()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # The testdata events table carries parquet TIMESTAMP(NANOS), which
        # Spark has no native type for; read as epoch-nanos long and convert
        # at the source layer (sources/registry.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Read parquet timestamps as TIMESTAMP (UTC instant), not
        # TIMESTAMP_NTZ — BigQuery-parity: TIMESTAMP is always UTC.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # See sources/registry.py:ensure_session_confs — inferred
        # size>0/isnotnull filters re-evaluate expensive generator
        # expressions (shingles, band hashes) 3x per row.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
