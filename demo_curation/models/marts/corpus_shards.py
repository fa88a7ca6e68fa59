from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import sampling


def model(dbt, session):
    """Final training-corpus layout: unique survivors, globally
    shuffled into n_shards deterministic shards and WRITTEN that way —
    partitioned by shard, rows sorted by pos within each partition, so
    a training reader streams each shard file in epoch order with zero
    further shuffling."""
    dbt.config(materialized="table", partition_by="shard", cluster_by=["pos"])
    kept = dbt.ref("docs_kept")
    flags = dbt.ref("near_dup_flags").filter(~F.col("is_duplicate"))
    n_shards = int(dbt.config.get("n_shards", 8))
    uniq = kept.join(flags.select("doc_id"), "doc_id")
    return sampling.global_shuffle(uniq, "doc_id", n_shards).select(
        "doc_id", "lang", "source", "shard", "pos"
    )
