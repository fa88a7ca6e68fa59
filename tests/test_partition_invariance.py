"""Partition-invariance gate over the layout-sensitive query shapes.

A query's result must not depend on how the source happens to be split
into files — compaction is routine at scale and must be a no-op for
every consumer.  The full-registry sweep lives in
``tools/invariance_check.py`` (all queries, both layouts); this pytest
pins the shapes with a history or mechanism of layout sensitivity:

- per-partition local top-k merges (_topk_per_query, TakeOrdered)
- deterministic sampling/shuffle families (hash-gated, no RNG claim)
- spark_partition_id-grouped passes (distributed rank/ntile)
- streaming micro-batches following the file layout (stateful update
  log — reduced to final updates for exactly this reason)
- driver-side sampled boundaries (exact_ntile bucket bounds)
- iterative label propagation (canonical ids / components)
"""

from __future__ import annotations

import pytest

from dbt_core_gcloud_template_spark.queries import queries
from dbt_core_gcloud_template_spark.sources.registry import TABLES

SENSITIVE = [
    "embedding_cosine_topk",
    "docs_weighted_sample",
    "docs_stratified_sample",
    "docs_source_cap",
    "docs_global_shuffle",
    "customer_rfm",
    "docs_curriculum_buckets",
    "events_user_totals_stateful",
    "events_stream_tumbling",
    "dedup_canonical_ids",
    "docs_bm25_search",
    "multimodal_metadata",
    "docs_split_assignment",
    "token_countmin_topk",
]


@pytest.fixture(scope="module")
def many_files_sf_dir(tmp_path_factory, spark, sf_dir):
    d = tmp_path_factory.mktemp("many_files_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        # 7 files: prime, so boundaries never match the original layout
        df.repartition(7).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    return str(d)


def _digest(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_is_layout_invariant(spark, sf_dir, many_files_sf_dir, name):
    fn = queries()[name]
    assert _digest(fn(spark, sf_dir)) == _digest(fn(spark, many_files_sf_dir))
