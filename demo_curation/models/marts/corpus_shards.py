from dbt_core_gcloud_template_spark.operators import sampling


def model(dbt, session):
    """Final training-corpus layout: despanned unique survivors,
    globally shuffled into n_shards deterministic shards and WRITTEN
    that way — partitioned by shard, rows sorted by pos within each
    partition, so a training reader streams each shard file in epoch
    order with zero further shuffling."""
    dbt.config(materialized="table", partition_by="shard", cluster_by=["pos"])
    uniq = dbt.ref("docs_despanned")
    n_shards = int(dbt.config.get("n_shards", 8))
    return sampling.global_shuffle(uniq, "doc_id", n_shards).select(
        "doc_id", "lang", "source", "shard", "pos"
    )
