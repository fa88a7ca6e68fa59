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
    # lazy: the nodes.count() below materializes e transitively (nodes
    # derives from e), so edge+degree build, node dedup, and the count
    # share ONE job instead of three (r14)
    e = edges.join(deg, "src").localCheckpoint(eager=False)
    # lazy checkpoint + count = one materialization job (r14)
    nodes = e.select(F.col("src").alias("node_id")).distinct().localCheckpoint(
        eager=False
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for it in range(iterations):
        # ONE shuffle per iteration: contributions union a 0.0 row per
        # node, and a single groupBy(node) folds both — the earlier
        # groupBy + nodes-LEFT-JOIN formulation paid a second
        # node-keyed exchange/join per round purely to re-attach
        # zero-in-degree nodes (guide §2.4; same shape
        # connected_components already uses).  Values are bit-identical:
        # the extra 0.0 summand is an IEEE no-op on the strictly
        # positive contributions, and a contribution-less node folds to
        # sum=0.0 exactly like the old coalesce.
        contribs = e.join(ranks, e.src == ranks.node_id).select(
            F.col("dst").alias("node_id"),
            (F.col("pr") / F.col("outdeg")).alias("c"),
        )
        ranks = (
            contribs.unionByName(nodes.withColumn("c", F.lit(0.0)))
            .groupBy("node_id")
            .agg((F.lit(base) + F.lit(damping) * F.sum("c")).alias("pr"))
        )
        # Checkpoint every SECOND round (and the last): each eager
        # checkpoint is a driver-blocking job, and a two-round lineage
        # (two join+agg layers over the checkpointed edge frame) is
        # still a bounded plan — this halves the fixed per-iteration
        # job count without reopening the unbounded-lineage trap the
        # checkpoint exists to prevent (r14; values are unchanged —
        # checkpointing is value-neutral).
        if it % 2 == 1 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node_id", F.col("pr").alias("pagerank"))


def triangle_counts(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient
    over the undirected pair graph (near-dup graph density: a node in
    many triangles sits in a tight duplicate cluster, not a chain of
    borderline matches).

    Degree-ordered "compact-forward" enumeration: every edge is
    oriented from its lower (degree, id)-ranked endpoint to the higher,
    so each triangle is enumerated EXACTLY once at its minimum-rank
    apex, and — the scale property — a node's out-degree is bounded by
    O(sqrt(|E|)) regardless of raw degree, which caps the wedge
    (2-path) blowup that kills the naive edge-edge self-join on hub
    nodes.  Two equi-joins, both on narrow int keys; the wedge set is
    sum-of-out-degree-squared, the theoretical minimum for exact
    counting.

    Output: node_id, degree, n_triangles, clustering (6dp) — every
    node of the pair graph appears, zero-triangle nodes included.
    """
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    e = e.localCheckpoint(eager=False)  # reused 3×: degrees, wedges, closure
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    da = deg.select(F.col("node_id").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("node_id").alias("b"), F.col("degree").alias("_db"))
    ranked = e.join(da, "a").join(db, "b")
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    directed = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    d1 = directed.select("u", F.col("v").alias("_v1"))
    d2 = directed.select("u", F.col("v").alias("_v2"))
    wedges = d1.join(d2, "u").filter(F.col("_v1") < F.col("_v2"))
    tri = wedges.join(
        e,
        (F.col("_v1") == F.col("a")) & (F.col("_v2") == F.col("b")),
    ).select("u", F.col("_v1").alias("x"), F.col("_v2").alias("y"))
    per_node = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    d = F.col("degree")
    return (
        deg.join(per_node, "node_id", "left")
        .select(
            "node_id",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
            F.when(
                d >= 2,
                F.round(
                    (F.lit(2.0) * F.coalesce(F.col("n_triangles"), F.lit(0)))
                    / (d * (d - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )
