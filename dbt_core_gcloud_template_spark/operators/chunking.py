"""Document chunking and sequence packing for training-data pipelines.

Two map-side operators a 100 TB pretraining pipeline runs after
cleaning/dedup and before tokenizer sharding:

- **Chunking**: split each document into fixed-size token windows with
  a stride (overlap), the standard long-document treatment before
  embedding or context-window-bounded training.  Pure array
  higher-order functions (sequence/transform/slice) + one explode —
  no shuffle at all; each input split streams through codegen once
  and emits its chunks locally.

- **Sequence packing**: concatenate-then-split assignment of documents
  into fixed-token training sequences (GPT-style packing).  Each doc
  is assigned to the sequence its first token lands in, via a
  cumulative sum windowed *within a partition column* (e.g. language
  or shard id) — the window never sees more than one partition's rows,
  so at 100 TB every shard packs in parallel; a single global ordering
  would serialize the whole corpus through one task.

Both are deterministic (no RNG, ordering only by ids), so re-runs and
engine comparisons reproduce byte-identical assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources.registry import ensure_parallelism


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 16,
    stride: int = 12,
) -> DataFrame:
    """Sliding-window token chunks: start positions 1, 1+stride, ... .

    The number of chunks is ``max(1, ceil((n - chunk_size)/stride) + 1)``
    — one chunk when the doc fits, and no trailing chunk that is fully
    contained in its predecessor.  The final chunk may be shorter than
    ``chunk_size`` (no padding here; padding is a tokenizer concern).

    Output: <id_col>, chunk_id, n_chunk_tokens, chunk_text.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    if stride > chunk_size:
        raise ValueError("stride > chunk_size would drop tokens between chunks")
    df = ensure_parallelism(df)
    tok = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col), tok.alias("_tok")).filter(F.size("_tok") > 0)
    n = F.size("_tok")
    n_chunks = F.greatest(
        F.lit(1).cast("bigint"),
        (F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))) + F.lit(1)).cast(
            "bigint"
        ),
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("bigint"), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.slice(F.col("_tok"), (i * stride + 1).cast("int"), chunk_size).alias(
                "toks"
            ),
        ),
    )
    return (
        base.select(id_col, F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.toks").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("c.toks")).alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 64,
    partition_col: str | None = None,
) -> DataFrame:
    """Concatenate-then-split packing: docs (ordered by id within each
    ``partition_col`` group) are laid end-to-end and cut into
    ``seq_len``-token sequences; a doc belongs to the sequence its
    first token lands in.  Docs longer than ``seq_len`` are clipped to
    one sequence's worth (the chunking operator is the right tool for
    long docs — run it first).

    Output (one row per packed sequence): [partition_col], seq_no,
    n_docs, n_tokens, fill_ratio.  ``fill_ratio`` may exceed 1 for a
    sequence whose last doc spills into the next cut — the spill
    tokens are counted where the doc starts.
    """
    df = ensure_parallelism(df)
    tok = tokens_expr(F.col(text_col))
    parts = [partition_col] if partition_col else []
    base = (
        df.select(*parts, F.col(id_col), F.size(tok).alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            *parts,
            id_col,
            F.least(F.col("_n"), F.lit(seq_len)).cast("bigint").alias("_clipped"),
        )
    )
    w = (
        Window.partitionBy(*parts).orderBy(id_col)
        if parts
        else Window.orderBy(id_col)
    ).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("_clipped").over(w), F.lit(0).cast("bigint"))
    assigned = base.select(
        *parts,
        id_col,
        "_clipped",
        F.floor(cum_before / F.lit(seq_len)).cast("bigint").alias("seq_no"),
    )
    return (
        assigned.groupBy(*parts, "seq_no")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_clipped").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "fill_ratio", F.round(F.col("n_tokens") / F.lit(float(seq_len)), 6)
        )
    )
