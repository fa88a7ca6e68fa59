"""Graph operators over near-duplicate pair sets.

The dedup families (MinHash-LSH, SimHash, n-gram Jaccard — see
``operators/dedup.py``) emit PAIRS; turning pairs into per-document
decisions is a graph problem.  ``dedup.connected_components`` gives
cluster membership; this module adds **PageRank** — a per-node
centrality score used in training-data curation to pick the most
"connected" representative of a duplicate cluster, or to score pages
by link authority when the edge set is a web graph.

Iterative-algorithm discipline at 100 TB (same rules as
``connected_components``):

- The edge set is re-read EVERY iteration, so it is localCheckpointed
  once up front — otherwise each round re-executes the whole upstream
  pipeline (shingle → minhash → band join) that produced the pairs.
- Each iteration's ranks are localCheckpointed too: without it the
  lineage (and the physical plan) grows linearly with iterations —
  the classic iterative-join trap.
- One shuffle per iteration (groupBy dst); the edge join is a plain
  equi-join AQE can plan as broadcast when ranks are small.

Deterministic: no rand(), fixed iteration count, double arithmetic.
Rounding the published score to 6 dp absorbs summation-order jitter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """Damped PageRank over the undirected pair graph.

    ``pairs`` is any near-dup pair set with one row per undirected edge
    (a < b).  Both directions are materialized, so every node has
    out-degree ≥ 1 — no dangling-mass correction term is needed.

    Fixed ``iterations`` (not convergence-tested): the output is a
    curation score, and a bounded plan is what survives a 1000-executor
    scheduler; callers needing convergence loop externally on the
    returned frame.

    Output: node_id, pagerank (sums to ~1 over the node set).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    # out-degree rides along with each edge so the per-iteration join
    # is single; checkpoint the combined frame ONCE (edges + degrees
    # are loop-invariant)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e = edges.join(deg, "src").localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node_id")).distinct().localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node_id)
            .select(F.col("dst").alias("node_id"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("node_id")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "node_id", "left")
            .select(
                "node_id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node_id", F.col("pr").alias("pagerank"))
