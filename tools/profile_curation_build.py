"""Phase-instrument engine_curation_build / engine_build (r14 verdict
item #3): per-node execution_time from RunResults plus wall-clock of the
non-node phases (Engine construction, register_sources, compile).

Usage: python tools/profile_curation_build.py [project] [schema] [runs]
       (defaults: demo_curation curation_dev 3; env: SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import warmup  # noqa: E402
from dbt_core_gcloud_template_spark.session import get_spark  # noqa: E402


def main() -> None:
    project = sys.argv[1] if len(sys.argv) > 1 else "demo_curation"
    schema = sys.argv[2] if len(sys.argv) > 2 else "curation_dev"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    spark = get_spark("prof-build", warehouse_dir=tempfile.mkdtemp(prefix="profb_wh_"))
    warmup(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    from dbt_core_gcloud_template_spark.plans.runner import Engine

    for i in range(runs + 1):
        spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
        shutil.rmtree(os.path.join(wh, "engine_data", schema), ignore_errors=True)
        cat = os.path.join(wh, "engine_catalog.json")
        if os.path.exists(cat):
            os.remove(cat)
        state = tempfile.mkdtemp(prefix="prof_state_")
        t0 = time.time()
        eng = Engine(spark, project, state_dir=state)
        t_init = time.time() - t0
        t0 = time.time()
        r, _ = eng.build()
        t_build = time.time() - t0
        shutil.rmtree(state, ignore_errors=True)
        if i == 0:
            continue  # untimed warm-up
        nodes = sorted(
            ((x.unique_id, round(x.execution_time, 3)) for x in r.results),
            key=lambda kv: -kv[1],
        )
        print(
            json.dumps(
                {
                    "run": i,
                    "engine_init_sec": round(t_init, 3),
                    "build_sec": round(t_build, 3),
                    "node_sum_sec": round(sum(v for _, v in nodes), 3),
                    "nodes": nodes[:18],
                }
            )
        )


if __name__ == "__main__":
    main()
