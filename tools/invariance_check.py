"""Partition-invariance check: every registered query must produce the
same VALUE SET whether each source table is one parquet file or many
small ones.

At scale the file layout is an accident of the upstream writer — a
result that changes when a table is compacted or split is a
correctness bug (spark_partition_id leakage, first()/head nondeterminism,
sample() drift, micro-batch-boundary-dependent streaming output).
Every query here is either naturally layout-free or explicitly reduces
layout-dependent intermediates (e.g. the stateful streaming update log
collapses to each user's final update).

Usage: python tools/invariance_check.py [sf_dir] [query ...]
Re-lays each table as 7 files in a temp dir on first use, then runs
each query against both layouts and compares order-insensitive digests.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from verify_local import frame_digest  # noqa: E402

from dbt_core_gcloud_template_spark.queries import queries  # noqa: E402
from dbt_core_gcloud_template_spark.session import get_spark  # noqa: E402
from dbt_core_gcloud_template_spark.sources.registry import TABLES  # noqa: E402


def relay_tables(spark, src: str, dst: str, n_files: int = 7) -> None:
    """Rewrite each table as ``n_files`` parquet files (a prime, so the
    boundaries never line up with the original layout)."""
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.repartition(n_files).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    spark = get_spark("invariance_check")
    many = os.path.join(tempfile.gettempdir(), "invariance_many_sf")
    if not os.path.exists(os.path.join(many, "region.parquet")):
        relay_tables(spark, src, many)
        print(f"re-laid tables at {many}", flush=True)

    qs = queries()
    names = [n for n in sorted(qs) if not only or n in only]
    fails = []
    for name in names:
        try:
            a = qs[name](spark, src)
            b = qs[name](spark, many)
            da = frame_digest(a.columns, [tuple(r) for r in a.collect()])
            db = frame_digest(b.columns, [tuple(r) for r in b.collect()])
            ok = da == db
            print(f"{'OK  ' if ok else 'DIFF'} {name}: {da} vs {db}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}", flush=True)
            ok = False
        if not ok:
            fails.append(name)
    print(f"\n{len(names) - len(fails)}/{len(names)} invariant; failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
