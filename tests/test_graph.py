"""Graph operators: PageRank and the weighted/mixture sampling ops."""

import math

import pytest
from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators.dedup import connected_components
from dbt_core_gcloud_template_spark.operators.graph import pagerank
from dbt_core_gcloud_template_spark.operators.sampling import weighted_sample_topk


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["a_id", "b_id"])


def test_pagerank_sums_to_one_and_ranks_hub_highest(spark):
    # star: 1 is connected to 2,3,4; plus an isolated edge 10-11
    pr = pagerank(_pairs(spark, [(1, 2), (1, 3), (1, 4), (10, 11)]))
    rows = {r.node_id: r.pagerank for r in pr.collect()}
    assert set(rows) == {1, 2, 3, 4, 10, 11}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    # the hub dominates its leaves; symmetric pair splits evenly
    assert rows[1] > rows[2] == rows[3] == rows[4]
    assert rows[10] == pytest.approx(rows[11])


def test_pagerank_empty_pairs(spark):
    empty = _pairs(spark, [(1, 2)]).filter(F.lit(False))
    assert pagerank(empty).count() == 0


def test_pagerank_matches_reference_triangle(spark):
    # triangle = symmetric regular graph: stationary distribution is
    # uniform regardless of damping/iterations
    pr = pagerank(_pairs(spark, [(1, 2), (2, 3), (1, 3)]))
    for r in pr.collect():
        assert r.pagerank == pytest.approx(1 / 3, abs=1e-12)


def test_connected_components_chain(spark):
    # chain a-b-c-d plus separate pair: CC must traverse transitively
    cc = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (9, 10)]))
    got = {r.node_id: r.component_id for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9, 10: 9}


def test_weighted_sample_topk_deterministic_and_weight_biased(spark):
    rows = [(i, 1.0 if i < 500 else 100.0) for i in range(600)]
    df = spark.createDataFrame(rows, ["k", "w"])
    s1 = weighted_sample_topk(df, "k", "w", k=50)
    s2 = weighted_sample_topk(df, "k", "w", k=50)
    ids1 = sorted(r.k for r in s1.collect())
    assert ids1 == sorted(r.k for r in s2.collect())  # deterministic
    assert len(ids1) == 50
    # 100 heavy keys (w=100) vs 500 light (w=1): heavy keys dominate
    heavy = sum(1 for i in ids1 if i >= 500)
    assert heavy > 40
    # sample_key column is the A-ES key: ln(u)/w <= 0
    assert all(r.sample_key <= 0 for r in s1.collect())


def test_weighted_sample_key_formula(spark):
    from dbt_core_gcloud_template_spark.functions.hashing import md5_int28

    df = spark.createDataFrame([(7, 3.0)], ["k", "w"])
    got = weighted_sample_topk(df, "k", "w", k=1).collect()[0]
    h = df.select(md5_int28(F.concat(F.lit("wsample"), F.col("k").cast("string")))).collect()[0][0]
    expect = math.log((h + 1) / float(1 << 28)) / 3.0
    assert got.sample_key == pytest.approx(expect, rel=1e-12)


def test_triangle_counts_known_graph(spark):
    from dbt_core_gcloud_template_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, clustering 1.0 everywhere) plus a
    # pendant chain 4-5-6 (no triangles through 5, 6)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "a_id long, b_id long",
    )
    rows = {r["node_id"]: r for r in triangle_counts(pairs).collect()}
    assert rows[1]["n_triangles"] == 3 and rows[1]["clustering"] == 1.0
    assert rows[2]["n_triangles"] == 3 and rows[3]["n_triangles"] == 3
    assert rows[4]["n_triangles"] == 3 and rows[4]["degree"] == 4
    assert rows[4]["clustering"] == 0.5  # 2*3/(4*3)
    assert rows[5]["n_triangles"] == 0 and rows[5]["clustering"] == 0.0
    assert rows[6]["degree"] == 1 and rows[6]["clustering"] == 0.0


def test_triangle_counts_dedupes_reversed_edges(spark):
    from dbt_core_gcloud_template_spark.operators.graph import triangle_counts

    # duplicate + reversed edges must not inflate counts
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (1, 3)], "a_id long, b_id long"
    )
    rows = {r["node_id"]: r for r in triangle_counts(pairs).collect()}
    assert all(r["n_triangles"] == 1 for r in rows.values())
    assert all(r["degree"] == 2 for r in rows.values())
