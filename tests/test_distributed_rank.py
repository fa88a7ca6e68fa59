"""Distributed exact ranking must be bit-exact with the
single-partition window it replaces (operators/distributed_rank.py)."""

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators.distributed_rank import (
    exact_ntile,
    with_global_rank,
)


def _random_df(spark, n, seed, n_values=None):
    rng = random.Random(seed)
    hi = n_values or max(2, n // 3)  # force plenty of first-key ties
    rows = [
        Row(id=i, v=rng.randint(0, hi), d=rng.random())
        for i in range(n)
    ]
    return spark.createDataFrame(rows).repartition(8)


def test_global_rank_matches_single_window(spark):
    df = _random_df(spark, 500, seed=1)
    got = with_global_rank(df, ["v", "d", "id"], rows_per_bucket=40)
    w = Window.orderBy(F.col("v").asc(), F.col("d").asc(), F.col("id").asc())
    want = df.withColumn("rank", F.row_number().over(w).cast("bigint"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_global_rank_is_a_permutation_and_deterministic(spark):
    df = _random_df(spark, 300, seed=2)
    a = with_global_rank(df, ["v", "id"], rows_per_bucket=25)
    ranks = sorted(r["rank"] for r in a.select("rank").collect())
    assert ranks == list(range(1, 301))
    b = with_global_rank(df, ["v", "id"], rows_per_bucket=25)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_global_rank_multibucket_plan_has_partitioned_window(spark):
    """With many buckets the window must be partitioned (no
    single-partition WindowExec) — the whole point of the operator."""
    df = _random_df(spark, 400, seed=3)
    got = with_global_rank(df, ["d", "id"], rows_per_bucket=30)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_rank_bucket" in plan  # window runs partitioned by bucket


@pytest.mark.parametrize("n,tiles", [(17, 4), (100, 4), (3, 7), (40, 1), (256, 10)])
def test_exact_ntile_matches_sql_ntile(spark, n, tiles):
    df = _random_df(spark, n, seed=n + tiles)
    got = exact_ntile(df, tiles, ["v", "id"], rows_per_bucket=10)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.withColumn("tile", F.ntile(tiles).over(w).cast("int"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_small_input_falls_back_to_plain_window(spark):
    df = _random_df(spark, 20, seed=9)
    got = with_global_rank(df, ["v", "id"])  # default 1M rows/bucket
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.withColumn("rank", F.row_number().over(w).cast("bigint"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_empty_input(spark):
    df = spark.createDataFrame([], "v int, id int")
    assert with_global_rank(df, ["v", "id"]).count() == 0
    assert exact_ntile(df, 4, ["v", "id"]).count() == 0


def test_order_cols_required(spark):
    df = _random_df(spark, 5, seed=4)
    with pytest.raises(ValueError):
        with_global_rank(df, [])
    with pytest.raises(ValueError):
        exact_ntile(df, 0, ["v"])


def test_exact_ntile_multi_matches_chained_calls(spark):
    """r13: exact_ntile_multi shares one sample job and one histogram
    job across dimensions; tiles must be bit-identical to the chained
    single-dimension calls (and therefore to SQL NTILE)."""
    from dbt_core_gcloud_template_spark.operators.distributed_rank import (
        exact_ntile_multi,
    )

    df = _random_df(spark, 300, seed=13)
    chained = exact_ntile(df, 4, ["v", "id"], "t1", rows_per_bucket=25)
    chained = exact_ntile(chained, 4, ["d", "id"], "t2", rows_per_bucket=25)
    multi = exact_ntile_multi(
        df,
        4,
        [(["v", "id"], "t1"), (["d", "id"], "t2")],
        rows_per_bucket=25,
    )
    assert sorted(map(tuple, multi.collect())) == sorted(
        map(tuple, chained.collect())
    )
    # multi-bucket path actually engaged (not the plain-window fallback)
    plan = multi._jdf.queryExecution().executedPlan().toString()
    assert "_rank_bucket" in plan


def test_exact_ntile_multi_small_input_and_empty(spark):
    from dbt_core_gcloud_template_spark.operators.distributed_rank import (
        exact_ntile_multi,
    )

    small = _random_df(spark, 20, seed=14)
    got = exact_ntile_multi(small, 4, [(["v", "id"], "t1")])
    want = exact_ntile(small, 4, ["v", "id"], "t1")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    empty = spark.createDataFrame([], "v int, id int")
    assert exact_ntile_multi(empty, 4, [(["v", "id"], "t1")]).count() == 0
