"""Data-diff operator (SURVEY.md §2 E14/J1/U1/U2; reference
macros/compare_dev_prod.sql:77-127 and scripts/pr_data_diff.sh).

Semantics reproduced from the reference:
- counts for both sides,
- symmetric EXCEPT DISTINCT diff tagged with ``diff_type`` (P8),
- bounded row sample (``limit``, default 100 like the macro header),
- a parseable ``SUMMARY|table=..|dev=..|prod=..|...`` line.

Scale design (SURVEY §7.7): for wide rows, compare xxhash64(struct(*))
instead of full-row EXCEPT — the shuffle then moves 8-byte hashes, not
entire rows.  The symmetric diff is ONE tag-union-aggregate pass (a
single shuffle yields both directions and their counts), not four
independent anti-joins; no collect() on the data path (the sample is
explicitly bounded).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LIMIT = 100  # reference macros/compare_dev_prod.sql:1


@dataclass
class DiffResult:
    table: str
    status: str  # EXISTS | NEW_MODEL (reference compare_dev_prod.sql:64-77)
    dev_count: int = 0
    prod_count: int = 0
    dev_not_in_prod: int = 0
    prod_not_in_dev: int = 0
    sample: DataFrame | None = None

    @property
    def summary_line(self) -> str:
        """Reference compare_dev_prod.sql:122-123 parseable summary."""
        return (
            f"SUMMARY|table={self.table}|status={self.status}"
            f"|dev={self.dev_count}|prod={self.prod_count}"
            f"|dev_not_in_prod={self.dev_not_in_prod}"
            f"|prod_not_in_dev={self.prod_not_in_dev}"
        )


def diff_frames(
    dev: DataFrame,
    prod: DataFrame,
    limit: int = DEFAULT_LIMIT,
    by_hash: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(tagged symmetric diff, single-row counts frame).

    ``by_hash=True`` is the 100 TB path: rows reduce to xxhash64 of the
    full struct before the EXCEPT, so the anti-join shuffles 8 bytes/row.
    """
    if by_hash:
        cols = dev.columns
        dev = dev.select(F.xxhash64(F.struct(*cols)).alias("row_hash"))
        prod = prod.select(F.xxhash64(F.struct(*cols)).alias("row_hash"))
    # One symmetric pass instead of four independent anti-joins: tag each
    # side, aggregate per distinct row, and classify by presence.  A
    # single shuffle on the full row produces both diff directions AND
    # the raw side totals (sum of per-row multiplicities — no separate
    # count scans); the reference's four separate queries
    # (compare_dev_prod.sql:79-95) collapse into one job.
    tagged = dev.select("*", F.lit(1).alias("_dev"), F.lit(0).alias("_prod")).unionByName(
        prod.select("*", F.lit(0).alias("_dev"), F.lit(1).alias("_prod"))
    )
    presence = tagged.groupBy(*[c for c in tagged.columns if c not in ("_dev", "_prod")]).agg(
        F.sum("_dev").alias("_n_dev"), F.sum("_prod").alias("_n_prod")
    )
    data_cols = [c for c in dev.columns]
    # ONE pass for everything: the side totals and both direction
    # counts ride the single groupBy shuffle as Observation metrics
    # (CollectMetrics — driver-side scalars computed during execution,
    # free at any scale), so neither counts nor sample re-runs the
    # expensive aggregation.  The diff set itself is small by
    # construction (it is what CHANGED between two builds of the same
    # model), so persisting it is safe at any scale.
    from pyspark.sql import Observation

    obs_tot = Observation()
    obs_dir = Observation()
    presence = presence.observe(
        obs_tot,
        F.coalesce(F.sum("_n_dev"), F.lit(0)).alias("dev_count"),
        F.coalesce(F.sum("_n_prod"), F.lit(0)).alias("prod_count"),
    )
    sym = presence.filter((F.col("_n_dev") > 0) != (F.col("_n_prod") > 0)).withColumn(
        "diff_type",
        F.when(F.col("_n_dev") > 0, "in_dev_not_in_prod").otherwise(
            "in_prod_not_in_dev"
        ),
    )
    full = (
        sym.select("diff_type", *data_cols)
        .observe(
            obs_dir,
            F.coalesce(
                F.sum(F.when(F.col("diff_type") == "in_dev_not_in_prod", 1)), F.lit(0)
            ).alias("dev_not_in_prod"),
            F.coalesce(
                F.sum(F.when(F.col("diff_type") == "in_prod_not_in_dev", 1)), F.lit(0)
            ).alias("prod_not_in_dev"),
        )
        .persist()
    )
    full.count()  # materialize: fills both observations in this one job
    diff = full.limit(limit) if limit else full
    spark = dev.sparkSession
    counts = spark.createDataFrame(
        [{**obs_tot.get, **obs_dir.get}],
        "dev_count bigint, prod_count bigint, dev_not_in_prod bigint, prod_not_in_dev bigint",
    )
    return diff, counts


def dev_prod_diff(
    spark: SparkSession,
    table: str,
    dev_schema: str,
    prod_schema: str,
    limit: int = DEFAULT_LIMIT,
    by_hash: bool = False,
) -> DiffResult:
    """The run-operation entry point (reference dev_prod_diff macro)."""
    dev_fqn = f"{dev_schema}.{table}"
    prod_fqn = f"{prod_schema}.{table}"
    if not spark.catalog.tableExists(dev_fqn):
        raise ValueError(f"dev relation does not exist: {dev_fqn}")
    if not spark.catalog.tableExists(prod_fqn):
        # NEW_MODEL branch: dev exists, prod absent (compare_dev_prod.sql:71-76)
        dev_df = spark.table(dev_fqn)
        return DiffResult(table=table, status="NEW_MODEL", dev_count=dev_df.count())
    diff, counts = diff_frames(
        spark.table(dev_fqn), spark.table(prod_fqn), limit=limit, by_hash=by_hash
    )
    row = counts.collect()[0]
    return DiffResult(
        table=table,
        status="EXISTS",
        dev_count=row["dev_count"],
        prod_count=row["prod_count"],
        dev_not_in_prod=row["dev_not_in_prod"],
        prod_not_in_dev=row["prod_not_in_dev"],
        sample=diff,
    )
