"""Phase-instrument docs_hybrid_rrf (r14 verdict item #1).

Times each composition phase with bench.py's methodology (warm-up +
median of 3 noop-sink runs) and counts Spark jobs per phase via
statusTracker job-group ids.

Usage: python tools/profile_hybrid_rrf.py   [env: SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import warmup  # noqa: E402
from dbt_core_gcloud_template_spark.operators import ranking, similarity  # noqa: E402
from dbt_core_gcloud_template_spark.queries import queries  # noqa: E402
from dbt_core_gcloud_template_spark.session import get_spark  # noqa: E402
from dbt_core_gcloud_template_spark.sources.registry import load_table  # noqa: E402

_BM25_TERMS = ["table", "join", "hash", "scan"]
_K1, _B = 1.2, 0.75
_RRF_DEPTH = 50


def timed(spark, name, build, runs=3):
    build().write.format("noop").mode("overwrite").save()  # warm-up
    times = []
    jobs = None
    for i in range(runs):
        group = f"prof_{name}_{i}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
        jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
        spark.sparkContext.setJobGroup(None, None)
        spark.catalog.clearCache()
    return round(statistics.median(times), 3), jobs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("prof-rrf", warehouse_dir=tempfile.mkdtemp(prefix="prof_wh_"))
    warmup(spark)
    out = {}

    docs = lambda: load_table(spark, sf_dir, "documents")  # noqa: E731
    emb = lambda: load_table(spark, sf_dir, "embeddings")  # noqa: E731

    out["lex_bm25_top50"] = timed(
        spark,
        "lex",
        lambda: ranking.bm25_scores(
            docs(), "doc_id", "text", _BM25_TERMS, k1=_K1, b=_B, top_n=_RRF_DEPTH
        ),
    )
    out["vec_cosine_top50"] = timed(
        spark,
        "vec",
        lambda: similarity.cosine_topk(
            emb(), "vec_id", "embedding", [0], k=_RRF_DEPTH
        ),
    )

    def fused_join():
        lex = ranking.bm25_scores(
            docs(), "doc_id", "text", _BM25_TERMS, k1=_K1, b=_B, top_n=_RRF_DEPTH
        ).select("doc_id", F.col("rank").alias("lex_rank"))
        vec = similarity.cosine_topk(
            emb(), "vec_id", "embedding", [0], k=_RRF_DEPTH
        ).select(F.col("vec_id").alias("doc_id"), F.col("rank").alias("vec_rank"))
        return lex.join(vec, "doc_id", "full_outer")

    out["join_only"] = timed(spark, "join", fused_join)

    qs = queries()
    out["full_query"] = timed(
        spark, "full", lambda: qs["docs_hybrid_rrf"](spark, sf_dir)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
