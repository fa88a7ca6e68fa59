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
  would serialize the whole corpus through one task.  When even one
  group exceeds ``rows_per_bucket`` (a dominant language, or no
  partition column at all), the prefix sum switches to the
  distributed two-phase plan from ``distributed_rank`` — range-bucket
  the ids, window per bucket, broadcast the exclusive bucket offsets —
  so no window partition ever exceeds the bucket size.

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
    rows_per_bucket: int = 1_000_000,
    seed: int = 42,
) -> DataFrame:
    """Concatenate-then-split packing: docs (ordered by id within each
    ``partition_col`` group) are laid end-to-end and cut into
    ``seq_len``-token sequences; a doc belongs to the sequence its
    first token lands in.  Docs longer than ``seq_len`` are clipped to
    one sequence's worth (the chunking operator is the right tool for
    long docs — run it first).

    Scale path: the packing offset is a prefix sum ordered by id, and
    a window whose partition (one ``partition_col`` group, or the whole
    input when ``partition_col`` is None) exceeds ``rows_per_bucket``
    rows would serialize that group through ONE task.  Groups over the
    threshold — and ONLY those groups (r8 advisor: a high-cardinality
    ``partition_col`` with one hot group must not drag every healthy
    group's bucket totals through the driver) — take the distributed
    prefix sum, the :mod:`.distributed_rank` two-phase move re-based on
    SUM: seeded range boundaries on the id bucket each hot group into
    ≤256 id-ranges (a pure row-local expression, deterministic across
    plan re-executions), local prefix sums run per (group, bucket) in
    parallel, and per-bucket totals — (hot_groups × buckets) rows,
    bounded by total_rows/rows_per_bucket × 256, never
    all-groups-sized — come to the driver once to become exclusive
    bucket offsets applied via a broadcast join.  Cost: one counting
    pass + one boundary-sample job + one totals aggregate on top of
    the windowed pass, plus two broadcast routing joins when a hot
    group exists; groups at or under the threshold keep the plain
    windowed plan (cheapest, and every such group already packs in
    parallel).  Both paths emit byte-identical assignments.

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
    # Path decision: one counting pass — counted on the RAW frame (no
    # tokenization; a parquet scan prunes to the one group column, and
    # the no-partition case is a metadata-only count), an upper bound
    # on the filtered group sizes, so the switch can only fire early,
    # never late.  Routing is PER GROUP (r8 advisor): only groups whose
    # count exceeds ``rows_per_bucket`` take the bucketed path — the
    # rest keep the plain per-group window, which already packs them in
    # parallel.  That bounds the distributed path's driver-side offset
    # collect to O(hot_groups × 256) rows, and hot_groups ≤
    # total/rows_per_bucket by definition; routing ALL groups through
    # it on one hot group would make the collect O(all_groups × 256) —
    # unbounded under a high-cardinality interleaved partition_col.
    if parts:
        hot = df.groupBy(*parts).count().filter(
            F.col("count") > rows_per_bucket
        )
        # stats first, WITHOUT pinning: in the common all-cold case
        # this one aggregate is the entire path-decision cost (no
        # checkpoint write); only a hot result pays the second pass
        hstats = hot.agg(
            F.count("*").alias("n_hot"), F.sum("count").alias("hot_rows")
        ).first()
        if (hstats["n_hot"] or 0) == 0:
            assigned = _pack_assign_windowed(base, id_col, parts, seq_len)
        else:
            # hot exists: pin the (bounded) hot-key frame so the two
            # routing joins share one count computation
            hot = hot.localCheckpoint(eager=False)
            b_al = base.alias("_pb")
            h_al = F.broadcast(hot.select(*parts)).alias("_ph")
            # null-safe membership: a NULL group key is a window
            # partition like any other and must route consistently
            cond = [
                F.col(f"_pb.{c}").eqNullSafe(F.col(f"_ph.{c}"))
                for c in parts
            ]
            assigned = _pack_assign_distributed(
                b_al.join(h_al, cond, "left_semi"), id_col, parts,
                seq_len, rows_per_bucket, seed, int(hstats["hot_rows"]),
            ).unionByName(
                _pack_assign_windowed(
                    b_al.join(h_al, cond, "left_anti"), id_col, parts,
                    seq_len,
                )
            )
    else:
        total = df.count()
        if total > rows_per_bucket:
            assigned = _pack_assign_distributed(
                base, id_col, parts, seq_len, rows_per_bucket, seed, total
            )
        else:
            assigned = _pack_assign_windowed(base, id_col, parts, seq_len)
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


def _pack_assign_windowed(
    base: DataFrame, id_col: str, parts: list[str], seq_len: int
) -> DataFrame:
    """Plain windowed packing assignment — the below-threshold path and
    the distributed path's degenerate-sample fallback share this single
    definition so the two can never diverge."""
    w = (
        Window.partitionBy(*parts).orderBy(id_col)
        if parts
        else Window.orderBy(id_col)
    ).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("_clipped").over(w), F.lit(0).cast("bigint"))
    return base.select(
        *parts,
        id_col,
        "_clipped",
        F.floor(cum_before / F.lit(seq_len)).cast("bigint").alias("seq_no"),
    )


def _pack_assign_distributed(
    base: DataFrame,
    id_col: str,
    parts: list[str],
    seq_len: int,
    rows_per_bucket: int,
    seed: int,
    total: int,
) -> DataFrame:
    """Distributed exclusive prefix sum of ``_clipped`` ordered by id
    within each ``parts`` group — bucketed local windows + driver-side
    exclusive bucket offsets, the :func:`.distributed_rank.with_global_rank`
    shape with ``row_number`` replaced by SUM."""
    from pyspark.sql.types import LongType, StructField, StructType

    from .distributed_rank import _boundaries, _bucket_expr

    bounds = _boundaries(base, [id_col], rows_per_bucket, seed, n_rows=total)
    if not bounds:  # degenerate sample: the plain window is still safe
        return _pack_assign_windowed(base, id_col, parts, seq_len)
    bucketed = base.withColumn("_b", _bucket_expr([id_col], bounds))
    # Per-(group, bucket) token totals: groups × ≤256 rows to the
    # driver, folded into EXCLUSIVE offsets per group in bucket order.
    totals = bucketed.groupBy(*parts, "_b").agg(
        F.sum("_clipped").cast("bigint").alias("_bt")
    )
    by_group: dict[tuple, list] = {}
    for r in totals.collect():
        by_group.setdefault(tuple(r[c] for c in parts), []).append(
            (r["_b"], r["_bt"])
        )
    rows = []
    for gkey, buckets in by_group.items():
        running = 0
        for b, t in sorted(buckets):
            rows.append((*gkey, b, running))
            running += t
    schema = StructType(
        [totals.schema[c] for c in parts]
        + [totals.schema["_b"], StructField("_off", LongType())]
    )
    off_df = base.sparkSession.createDataFrame(rows, schema)
    # Null-safe equi-join: a NULL group key is its own window partition
    # and must keep its offset row (a plain equi-join would drop it).
    b_al, o_al = bucketed.alias("_l"), F.broadcast(off_df).alias("_r")
    cond = [
        F.col(f"_l.{c}").eqNullSafe(F.col(f"_r.{c}")) for c in [*parts, "_b"]
    ]
    joined = b_al.join(o_al, cond, "inner").select(
        *[F.col(f"_l.{c}") for c in [*parts, id_col, "_clipped", "_b"]],
        F.col("_r._off").alias("_off"),
    )
    wloc = (
        Window.partitionBy(*parts, "_b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(
        F.sum("_clipped").over(wloc), F.lit(0).cast("bigint")
    )
    cum_before = F.col("_off") + local_before
    return joined.select(
        *parts,
        id_col,
        "_clipped",
        F.floor(cum_before / F.lit(seq_len)).cast("bigint").alias("seq_no"),
    )
