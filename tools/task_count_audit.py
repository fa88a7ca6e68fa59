"""Task/stage-count audit at the current SPARK_GRAFT_CPUS (r14 verdict
item #5): for each named query, run once warmed and report Spark jobs,
stages, and total tasks from the status tracker, plus wall time.

Usage: SPARK_GRAFT_CPUS=8|32 python tools/task_count_audit.py name ...
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import warmup  # noqa: E402
from dbt_core_gcloud_template_spark.queries import queries  # noqa: E402
from dbt_core_gcloud_template_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("task-audit", warehouse_dir=tempfile.mkdtemp())
    warmup(spark)
    qs = queries()
    tracker = spark.sparkContext.statusTracker()
    out = {"cpus": spark.sparkContext.defaultParallelism}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        group = f"audit_{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        jobs = tracker.getJobIdsForGroup(group)
        stages = set()
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is not None:
                stages.update(ji.stageIds)
        n_tasks = 0
        n_stages = 0
        for s in stages:
            si = tracker.getStageInfo(s)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
        out[name] = {
            "sec": round(dt, 2),
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        spark.sparkContext.setJobGroup(None, None)
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
