"""Train/eval contamination detection for LLM training corpora.

The question every training-data pipeline must answer before a model
ships: how many held-out (val/test) documents leak into the training
split through shared n-grams?  (Standard decontamination practice —
e.g. the n-gram overlap checks described in the GPT-3 and PaLM papers;
public methodology.)

Shape of the computation, Spark-first:

1. Both sides shingle to k-gram SETS (map-only array expressions from
   ``functions.text`` — no shuffle, no Python).
2. Shingles travel as 60-bit portable hashes, never strings: the join
   shuffles 8 bytes per posting instead of ~40 (same trick as
   ``dedup.ngram_jaccard_pairs``).
3. The train side is reduced to DISTINCT shingle hashes BEFORE the
   join — at 100 TB this is the critical move: the join's build side
   shrinks from |train postings| to |distinct train shingles|, and the
   aggregation is map-side combinable.
4. Left join eval postings → count hits per eval doc.  One shuffle for
   the distinct, one for the join, one for the final per-doc count.

The eval side is usually ~1% of the corpus (the split is 90/5/5), so
AQE plans the join with the small side shuffled; with a curated
benchmark suite as the eval side it becomes a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60
from ..functions.text import shingles_expr, tokens_expr
from ..sources.registry import ensure_parallelism


def ngram_contamination(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_eval: Column,
    is_train: Column,
    k_shingle: int = 5,
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Per eval document: how many of its k-gram shingles appear anywhere
    in the training split.

    ``is_eval`` / ``is_train`` are boolean Columns over ``docs`` (the
    split assignment — typically a deterministic hash bucket, never
    RNG).  Documents shorter than ``k_shingle`` tokens have no shingles
    and are excluded (nothing to leak).

    Output: <id_col>, n_shingles, n_overlap, contamination (rounded
    6dp), is_contaminated (contamination >= flag_threshold).
    """
    docs = ensure_parallelism(docs)
    sh = shingles_expr(F.col("_tok"), k_shingle)
    # Materialize the TOKEN array, then the shingle array, once per doc
    # BEFORE explode — a combined size+explode select plans the Project
    # above the Generate and re-runs the whole shingle pipeline per
    # exploded row (see dedup.ngram_jaccard_pairs), and an inline token
    # tree inside the shingle transform re-tokenizes per shingle
    # position (r13).
    base = docs.select(
        F.col(id_col),
        is_eval.alias("_eval"),
        is_train.alias("_train"),
        tokens_expr(F.col(text_col)).alias("_tok"),
    ).select(
        F.col(id_col), "_eval", "_train", sh.alias("_sh")
    )
    sized = base.select(id_col, "_eval", "_train", F.size("_sh").alias("n_sh"), "_sh")
    postings = sized.select(
        id_col, "_eval", "_train", "n_sh", F.explode("_sh").alias("_s")
    ).select(id_col, "_eval", "_train", "n_sh", md5_int60(F.col("_s")).alias("shingle"))

    train_shingles = (
        postings.filter(F.col("_train")).select("shingle").distinct()
    )
    eval_postings = postings.filter(F.col("_eval")).select(id_col, "n_sh", "shingle")
    hits = eval_postings.join(
        train_shingles.withColumn("_hit", F.lit(1)), "shingle", "left"
    )
    out = hits.groupBy(id_col).agg(
        F.max("n_sh").alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_overlap"),
    )
    contamination = F.round(F.col("n_overlap") / F.col("n_shingles"), 6)
    return out.select(
        id_col,
        "n_shingles",
        "n_overlap",
        contamination.alias("contamination"),
        (contamination >= F.lit(flag_threshold)).alias("is_contaminated"),
    )
