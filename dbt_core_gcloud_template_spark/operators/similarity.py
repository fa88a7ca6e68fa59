"""Similarity search over embedding columns (north-star; SURVEY.md §7.6).

Two tiers:

- **Brute-force cosine top-k** — the correctness baseline.  Query
  vectors are broadcast (they're the small side by construction); the
  scan side computes dot products with array higher-order functions
  (zip_with + aggregate) entirely in the JVM, then a per-query window
  takes top-k.  At 100 TB this is one pass over the corpus with no
  shuffle except the final per-query top-k (k rows per partition via
  AQE partial top-k).
- **Random-hyperplane LSH buckets** — the scale path.  Each vector maps
  to a b-bit bucket id (map-only); ANN search = brute force within the
  probe's bucket (and optionally neighboring buckets).  Hyperplane
  weights derive deterministically from MD5 so the DuckDB oracle
  reproduces bucket assignments bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.registry import ensure_parallelism


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Output: q_id, <id_col>, cosine (6dp), rank — deterministic via
    (cosine desc, id) ordering.
    """
    base = ensure_parallelism(emb).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("_qv")
    )
    joined = base.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("q_id"))
    cos = _dot(F.col("_v"), F.col("_qv")) / (_norm(F.col("_v")) * _norm(F.col("_qv")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "cosine", "rank")
    )


def hyperplane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5].

    w[i][j] = md5_int28(f"p{i}_d{j}") / 2^28 - 0.5 — reproducible from
    Python, Spark SQL, and DuckDB alike (the oracle embeds the literal
    values).
    """
    out = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"p{i}_d{j}".encode()).hexdigest()[:7], 16)
            row.append(h / float(1 << 28) - 0.5)
        out.append(row)
    return out


def lsh_bucket_ids(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
) -> DataFrame:
    """Assign each vector a sign-bucket id from n random hyperplanes.

    Map-only (one codegen pass); bucket id = Σ (dot(v, w_i) >= 0) << i.
    Output: <id_col>, bucket_id.
    """
    weights = hyperplane_weights(n_planes, dim)
    emb = ensure_parallelism(emb)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("bigint")
    for i in range(n_planes):
        w_arr = F.array(*[F.lit(w) for w in weights[i]])
        bit = F.when(_dot(v, w_arr) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("bigint") * F.lit(1 << i)
    return emb.select(F.col(id_col), bucket.alias("bucket_id"))


def lsh_ann_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """ANN: brute-force cosine only within the query's LSH bucket.

    The bucket equi-join replaces the cross join — at scale each query
    touches corpus/2^b candidates on average.
    Output: q_id, <id_col>, cosine (6dp), rank.
    """
    buckets = lsh_bucket_ids(emb, id_col, vec_col, dim, n_planes)
    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).join(buckets, id_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col("_v").alias("_qv"),
        F.col("bucket_id").alias("q_bucket"),
    )
    joined = base.join(
        F.broadcast(q), (F.col("bucket_id") == F.col("q_bucket")) & (F.col(id_col) != F.col("q_id"))
    )
    cos = _dot(F.col("_v"), F.col("_qv")) / (_norm(F.col("_v")) * _norm(F.col("_qv")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "cosine", "rank")
    )
