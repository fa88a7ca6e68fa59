from pyspark.sql import functions as F


def model(dbt, session):
    """dbt Python model (dbt 1.3 semantics): DataFrame-native mart.

    Per-bucket stats over fct_example plus the raw source rowcount —
    logic that is awkward in SQL-only dbt (imperative composition)
    but one idiomatic DataFrame chain here.
    """
    dbt.config(materialized="table")
    fct = dbt.ref("fct_example")
    n_raw = dbt.source("raw", "example").count()
    return (
        fct.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("value").cast("double"), 2).alias("total_value"),
            F.round(F.avg(F.col("value").cast("double")), 2).alias("avg_value"),
        )
        .withColumn("pct_of_raw", F.round(F.col("n_rows") / F.lit(n_raw), 6))
    )
