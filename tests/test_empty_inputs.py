"""Empty-input robustness: every registered query must plan AND execute
against zero-row source tables without raising.

At 100 TB this is not a corner case — daily partitions land empty, a
filter stage can legitimately eliminate every row, and a DAG node fed by
an empty upstream must degrade to an empty output rather than kill the
run (the reference's BigQuery jobs behave the same way: a query over an
empty table returns an empty result, it does not error).

Two deliberate exceptions, pinned here so a regression in either
direction is caught: ``embedding_kmeans_lists`` and ``embedding_ivf_topk``
train/consume a centroid model, and a model over an empty corpus is
mathematically undefined — they raise an actionable ``ValueError``
(exactly as ``pyspark.ml.clustering.KMeans.fit`` does) instead of
returning a silently-empty model.
"""

from __future__ import annotations

import duckdb
import pytest

from dbt_core_gcloud_template_spark.queries import queries
from dbt_core_gcloud_template_spark.sources.registry import TABLES

# Ops whose semantics are undefined on an empty corpus: must raise a
# clear ValueError, not return garbage.
MODEL_UNDEFINED_ON_EMPTY = {
    "embedding_kmeans_lists",
    "embedding_ivf_topk",
    # delegates to ivf_topk, whose inverted lists are undefined on an
    # empty corpus (same actionable ValueError)
    "ann_recall_eval",
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    """Zero-row parquet copies of every source table, schema-identical
    to the real testdata (LIMIT 0 through DuckDB preserves types)."""
    d = tmp_path_factory.mktemp("empty_sf")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_survives_empty_inputs(spark, empty_sf_dir, name):
    fn = queries()[name]
    if name in MODEL_UNDEFINED_ON_EMPTY:
        with pytest.raises(ValueError):
            df = fn(spark, empty_sf_dir)
            df.count()  # some guards only fire at action time
        return
    df = fn(spark, empty_sf_dir)
    # Must execute, not just plan; row count is unconstrained (global
    # aggregates legitimately emit one row over empty input).
    assert df.count() >= 0
