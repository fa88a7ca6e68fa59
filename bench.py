"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], median of 3 runs
per query, and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each run forces full materialization through the `noop` sink (no
collect cost, no output cost — measures the compute plan itself).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_core_gcloud_template_spark.queries import queries
from dbt_core_gcloud_template_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "window_topk_orders",
    "data_diff_rows",
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "docs_quality",
    "embedding_cosine_topk",
    "embedding_lsh_buckets",
    "events_tumbling_1h",
    "events_sessionized",
    "multimodal_metadata",
]

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    qs = queries()

    results: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        times = []
        for _ in range(RUNS):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        results[name] = round(statistics.median(times), 3)
    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock (median of 3, noop sink)",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
