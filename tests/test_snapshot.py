"""SCD2 snapshot semantics per FIXTURES.md F4 (reference
snapshots/example_snapshot.sql, dbt timestamp strategy)."""

from datetime import datetime

from dbt_core_gcloud_template_spark.operators.snapshot import snapshot_merge

T1 = datetime(2024, 1, 1)
T2 = datetime(2024, 1, 2)
T3 = datetime(2024, 1, 3)


def _src(spark, rows):
    return spark.createDataFrame(rows, "id long, value double, created_at_ts timestamp")


def test_scd2_lifecycle(spark):
    # t0: initial load → 2 open rows
    s0 = snapshot_merge(None, _src(spark, [(1, 50.0, T1), (2, 200.0, T1)]), "id", "created_at_ts")
    assert s0.count() == 2
    assert s0.filter("dbt_valid_to is null").count() == 2

    # t1: id=1 updated at T2; id=2 unchanged
    s1 = snapshot_merge(
        s0, _src(spark, [(1, 150.0, T2), (2, 200.0, T1)]), "id", "created_at_ts"
    )
    rows = {(r["id"], r["value"], r["dbt_valid_to"]) for r in s1.collect()}
    assert (1, 50.0, T2) in rows  # closed at the NEW updated_at
    assert (1, 150.0, None) in rows  # new open version
    assert (2, 200.0, None) in rows  # untouched
    assert s1.count() == 3

    # t2: id=3 new; id=1 unchanged; id=2 missing from source → stays open
    s2 = snapshot_merge(s1, _src(spark, [(1, 150.0, T2), (3, 10.0, T3)]), "id", "created_at_ts")
    assert s2.count() == 4
    open_ids = {r["id"] for r in s2.filter("dbt_valid_to is null").collect()}
    assert open_ids == {1, 2, 3}

    # idempotency: rerunning t2 is a no-op
    s3 = snapshot_merge(s2, _src(spark, [(1, 150.0, T2), (3, 10.0, T3)]), "id", "created_at_ts")
    assert s3.count() == 4
    assert s3.filter("dbt_valid_to is null").count() == 3


def test_scd2_source_dupes_take_latest(spark):
    # two versions of the same key in one load → only the latest becomes a row
    s = snapshot_merge(
        None, _src(spark, [(1, 1.0, T1), (1, 2.0, T2)]), "id", "created_at_ts"
    )
    rows = s.collect()
    assert len(rows) == 1 and rows[0]["value"] == 2.0


def test_scd2_check_strategy_lifecycle(spark):
    from dbt_core_gcloud_template_spark.operators.snapshot import snapshot_merge_check

    n1 = datetime(2024, 2, 1)
    n2 = datetime(2024, 2, 2)
    n3 = datetime(2024, 2, 3)
    # t0: initial load stamped at n1
    s0 = snapshot_merge_check(
        None, _src(spark, [(1, 50.0, T1), (2, 200.0, T1)]), "id", ["value"], now=n1
    )
    assert s0.count() == 2
    assert {r["dbt_valid_from"] for r in s0.collect()} == {n1}

    # t1: id=1 value changed -> close old at n2, insert new; id=2 unchanged
    s1 = snapshot_merge_check(
        s0, _src(spark, [(1, 150.0, T1), (2, 200.0, T1)]), "id", ["value"], now=n2
    )
    rows = {(r["id"], r["value"], r["dbt_valid_to"]) for r in s1.collect()}
    assert (1, 50.0, n2) in rows
    assert (1, 150.0, None) in rows
    assert (2, 200.0, None) in rows

    # t2: rerun identical source -> no-op (scd_id equality, not timestamps)
    s2 = snapshot_merge_check(
        s1, _src(spark, [(1, 150.0, T1), (2, 200.0, T1)]), "id", ["value"], now=n3
    )
    assert s2.count() == 3
    assert s2.filter("dbt_valid_to is null").count() == 2

    # check_cols=['value'] ignores drift in other columns
    s3 = snapshot_merge_check(
        s2, _src(spark, [(1, 150.0, T3), (2, 200.0, T3)]), "id", ["value"], now=n3
    )
    assert s3.count() == 3


def test_hard_deletes_invalidate_closes_missing_keys(spark):
    """dbt hard_deletes=invalidate: a key absent from the new source
    closes its open row at `now`; ignore keeps it open."""
    from datetime import datetime

    from dbt_core_gcloud_template_spark.operators.snapshot import snapshot_merge

    t = datetime
    src1 = spark.createDataFrame(
        [(1, "a", t(2024, 1, 1)), (2, "b", t(2024, 1, 1))],
        "id long, v string, updated_at timestamp",
    )
    snap = snapshot_merge(None, src1, "id", "updated_at")
    src2 = spark.createDataFrame(
        [(1, "a2", t(2024, 1, 2))], "id long, v string, updated_at timestamp"
    )
    now = t(2024, 1, 3)
    closed = snapshot_merge(snap, src2, "id", "updated_at", "invalidate", now)
    rows = {(r.id, r.v): r for r in closed.collect()}
    assert rows[(2, "b")].dbt_valid_to == now          # hard-deleted: closed
    assert rows[(1, "a")].dbt_valid_to == t(2024, 1, 2)  # superseded
    assert rows[(1, "a2")].dbt_valid_to is None
    kept = snapshot_merge(snap, src2, "id", "updated_at", "ignore", now)
    rows2 = {(r.id, r.v): r for r in kept.collect()}
    assert rows2[(2, "b")].dbt_valid_to is None         # ignore: stays open


def test_snapshot_scd2_registry_entry_traps(spark):
    """The oracle-gated snapshot_scd2 replay (queries/relational.py)
    carries the §7.5 trap semantics; assert them directly so a future
    oracle edit can't silently weaken what the hash is certifying:
    same-timestamp and late updates are no-ops (one version, original
    payload), superseded keys hold a closed+open pair whose valid_to
    chains to the new valid_from, and delivery-2 keys are open."""
    from pyspark.sql import functions as F

    from dbt_core_gcloud_template_spark.queries import queries

    df = queries()["snapshot_scd2"](spark, "/root/testdata/sf0.001")
    df = df.withColumn("m", F.col("k") % 7).cache()
    try:
        # same-timestamp (m=1) and late (m=2) updates: exactly one
        # version per key, still open, payload NOT overwritten
        for mod in (1, 2):
            grp = df.filter(F.col("m") == mod)
            assert grp.count() == grp.select("k").distinct().count()
            assert grp.filter(F.col("dbt_valid_to").isNotNull()).count() == 0
            assert grp.filter(F.col("status").isin("S", "L")).count() == 0
        # superseded keys (m=0): one closed original + one open 'U'
        changed = df.filter(F.col("m") == 0)
        per_key = changed.groupBy("k").agg(
            F.count("*").alias("n"),
            F.sum(F.col("dbt_valid_to").isNull().cast("int")).alias("n_open"),
        )
        assert per_key.filter("n <> 2 OR n_open <> 1").count() == 0
        # the closed version's valid_to equals the open version's
        # valid_from (close-and-insert chains, no gap/overlap)
        closed = changed.filter(F.col("dbt_valid_to").isNotNull()).select(
            "k", F.col("dbt_valid_to").alias("vt")
        )
        opened = changed.filter(
            F.col("dbt_valid_to").isNull() & (F.col("status") == "U")
        ).select("k", F.col("dbt_valid_from").alias("vf"))
        assert closed.join(opened, "k").filter("vt <> vf").count() == 0
        # delivery-2-only keys (m=3): one open version
        new = df.filter(F.col("m") == 3)
        assert new.count() == new.select("k").distinct().count()
        assert new.filter(F.col("dbt_valid_to").isNotNull()).count() == 0
    finally:
        df.unpersist()
