"""Graph queries over the near-duplicate pair set.

Dedup pair emitters (MinHash-LSH here) feed two iterative graph
operators: **connected components** (cluster membership — the
decision stage of fuzzy dedup) and **PageRank** (per-node centrality
— pick a cluster's most-connected representative).  Both are
driver-loop iterative algorithms whose per-round plans are bounded via
``localCheckpoint`` (see ``operators/graph.py`` / ``operators/dedup.py``).

Oracles: DuckDB computes the SAME edge set from the shared LSH CTE
chain (``queries/llm.py``), then
- components via a recursive CTE (exact transitive closure — feasible
  because the oracle runs at sf0.01), and
- PageRank via the 5 unrolled iteration CTEs (same fixed iteration
  count as the Spark side; scores rounded to 6 dp to absorb
  float-summation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, graph
from . import register
from .llm import lsh_candidate_pairs, lsh_pairs_cte

_EDGES_CTE = """, edges AS (
      SELECT a_id AS s, b_id AS t FROM pairs
      UNION
      SELECT b_id AS s, a_id AS t FROM pairs
    )"""


def _components_oracle() -> str:
    # exact transitive closure: UNION (not UNION ALL) dedupes visited
    # (node, reach) states so the recursion terminates on cycles
    return (
        lsh_pairs_cte().replace("WITH d AS", "WITH RECURSIVE d AS", 1)
        + _EDGES_CTE
        + """,
    reach(node_id, r) AS (
      SELECT s, t FROM edges
      UNION
      SELECT reach.node_id, e.t FROM reach JOIN edges e ON e.s = reach.r
    )
    SELECT CAST(node_id AS BIGINT) AS node_id,
           CAST(least(node_id, min(r)) AS BIGINT) AS component_id
    FROM reach GROUP BY node_id
    """
    )


@register("dedup_components", oracle=_components_oracle())
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over LSH candidate pairs: every document in
    a near-dup cluster labeled with the cluster's minimum doc_id.
    Handles CHAINS (a~b, b~c, a!~c) that one-round canonical_ids
    cannot — the full fuzzy-dedup decision stage."""
    pairs = lsh_candidate_pairs(spark, sf_dir)
    cc = dedup.connected_components(pairs, "a_id", "b_id")
    return cc.select(
        F.col("node_id").cast("bigint").alias("node_id"),
        F.col("component_id").cast("bigint").alias("component_id"),
    )


def _pagerank_oracle(damping: float = 0.85, iterations: int = 5) -> str:
    rounds = []
    for i in range(1, iterations + 1):
        rounds.append(
            f""", r{i} AS (
      SELECT n.node_id,
             {1 - damping:.2f}/(SELECT c FROM nn)
               + {damping}*coalesce(sum(p.pr / dg.outdeg), 0) AS pr
      FROM nodes n
      LEFT JOIN edges e ON e.t = n.node_id
      LEFT JOIN r{i - 1} p ON p.node_id = e.s
      LEFT JOIN deg dg ON dg.s = e.s
      GROUP BY n.node_id
    )"""
        )
    return (
        lsh_pairs_cte()
        + _EDGES_CTE
        + """,
    deg AS (SELECT s, count(*) AS outdeg FROM edges GROUP BY s),
    nodes AS (SELECT DISTINCT s AS node_id FROM edges),
    nn AS (SELECT count(*) AS c FROM nodes),
    r0 AS (SELECT node_id, 1.0/(SELECT c FROM nn) AS pr FROM nodes)"""
        + "".join(rounds)
        + f"""
    SELECT CAST(node_id AS BIGINT) AS node_id,
           round(pr, 6) AS pagerank
    FROM r{iterations}
    """
    )


@register("neardup_pagerank", oracle=_pagerank_oracle())
def neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 5 fixed iterations) over the undirected
    LSH pair graph — centrality score for choosing each dedup
    cluster's canonical representative."""
    pairs = lsh_candidate_pairs(spark, sf_dir)
    pr = graph.pagerank(pairs, "a_id", "b_id", damping=0.85, iterations=5)
    return pr.select(
        F.col("node_id").cast("bigint").alias("node_id"),
        F.round("pagerank", 6).alias("pagerank"),
    )


def _triangles_oracle() -> str:
    # naive a<b edge-edge-edge join: orientation-independent, exact —
    # fine at oracle scale; the Spark side uses degree-ordered
    # enumeration for the same counts
    return (
        lsh_pairs_cte()
        + """, e AS (
      SELECT least(a_id, b_id) AS a, greatest(a_id, b_id) AS b
      FROM pairs WHERE a_id <> b_id GROUP BY 1, 2
    ),
    deg AS (
      SELECT node_id, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT a AS node_id FROM e UNION ALL SELECT b FROM e
      ) GROUP BY node_id
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pn AS (
      SELECT node_id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS node_id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node_id
    )
    SELECT deg.node_id,
           deg.degree,
           CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.degree >= 2
                THEN round((2.0 * coalesce(pn.n_triangles, 0))
                           / (deg.degree * (deg.degree - 1)), 6)
                ELSE 0.0 END AS clustering
    FROM deg LEFT JOIN pn USING (node_id)
    """
    )


@register("neardup_triangles", oracle=_triangles_oracle())
def neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    LSH candidate-pair graph: distinguishes tight duplicate CLIQUES
    (high clustering) from chains of borderline matches (zero
    triangles) before committing to cluster-level dedup decisions."""
    pairs = lsh_candidate_pairs(spark, sf_dir)
    return graph.triangle_counts(pairs)
