"""Time a subset of registry queries with bench.py's exact methodology
(1 untimed warm-up + median of 3 noop-sink runs, clearCache between
queries) — for optimization-loop iteration without paying for the full
123-query HEADLINE.

Usage: python tools/bench_subset.py name1 name2 ...  [env: SPARK_GRAFT_SF_DIR]
Prints one JSON line {name: median_sec, ...} plus the two calibration
probes so runs on a loaded box remain comparable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import RUNS, calibration, calibration_compute, warmup  # noqa: E402
from dbt_core_gcloud_template_spark.queries import queries  # noqa: E402
from dbt_core_gcloud_template_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bench-subset", warehouse_dir=tempfile.mkdtemp(prefix="benchsub_wh_")
    )
    qs = queries()
    warmup(spark)
    results: dict[str, float] = {}
    results["calibration_range_agg"] = calibration(spark)
    results["calibration_hash_cpu"] = calibration_compute(spark)
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_subset: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(RUNS):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        results[name] = round(statistics.median(times), 3)
        spark.catalog.clearCache()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
