"""Exact global ranking without the single-partition window cliff.

``Window.orderBy(...)`` with no ``partitionBy`` funnels every row
through ONE task (Spark even warns: "No Partition Defined for Window
operation! Moving all data to a single partition").  On a dimension of
a few million rows that is survivable; on anything fact-sized it is the
canonical 100 TB scale failure.  This module provides the distributed
exact alternative — the textbook two-phase ranking:

1. **Deterministic range bucketing.**  A seeded sample of the order
   key picks boundary tuples; each row's bucket is *a pure function of
   its own values* (count of boundaries <= the row's key, lexicographic
   struct comparison).  Unlike ``repartitionByRange`` +
   ``spark_partition_id()``, re-executions of the plan can never
   disagree about which bucket a row is in, so no caching/exchange-reuse
   subtleties — each of the three jobs below may independently recompute
   the scan and still agree.
2. **Parallel local ranks.**  ``row_number`` over
   ``Window.partitionBy(bucket).orderBy(keys)`` — one hash shuffle on
   the bucket id, every bucket ranks concurrently.
3. **Prefix-sum offsets.**  Per-bucket counts are a map-side-combined
   aggregate (``n_buckets`` rows to the driver); global rank =
   bucket offset + local rank, applied via a literal-map lookup (no
   extra join or shuffle).

``exact_ntile`` is then pure arithmetic on the global rank, bit-exact
with SQL ``NTILE(n) OVER (ORDER BY keys)``: the first ``c % n`` tiles
get ``ceil(c/n)`` rows, the rest ``floor(c/n)``.

Cost model: one sample job + one count job + one windowed pass — three
scans of the (usually pre-aggregated) input instead of one, in exchange
for full cluster parallelism.  Callers ranking a small bounded set
should instead use the take-ordered pattern (``orderBy().limit(k)``
then a window over <= k rows), as `ranking.bm25_scores` does.

The order columns must form a TOTAL order (include a unique tiebreak),
ascending.  With ties, ``row_number`` is nondeterministic in any
engine; a total order also guarantees boundary-equal rows land in a
single bucket's sort, keeping ranks exact.

Reference parity: the reference template has no window functions at all
(SURVEY.md §2.5); this operator exists for the north-star scale path —
e.g. RFM quartiles (`queries/zoo.py::customer_rfm`) over a
billion-customer dimension.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank", "exact_ntile", "exact_ntile_multi"]

# Boundary comparisons are a linear scan per row; cap the literal array
# so the generated expression stays small.  256 buckets already spreads
# the window across 256 concurrent tasks.
_MAX_BUCKETS = 256


def _boundaries(
    df: DataFrame,
    order_cols: list[str],
    rows_per_bucket: int,
    seed: int,
    n_rows: int | None = None,
) -> list[tuple]:
    """Sorted boundary tuples from a seeded sample (deterministic for a
    fixed input + seed).  Returns [] when one bucket suffices."""
    n = df.count() if n_rows is None else n_rows
    if n <= rows_per_bucket:
        return []
    n_buckets = min(_MAX_BUCKETS, max(2, n // rows_per_bucket))
    oversample = 32  # sample rows per boundary: bounds balance, not exactness
    fraction = min(1.0, (n_buckets * oversample) / n)
    # NULL-bearing key tuples are excluded from the BOUNDARY sample
    # (they don't sort in Python, and a boundary containing NULL would
    # be useless anyway) — the rows themselves still bucket: every
    # NULL-key comparison in _bucket_expr is non-true, so they land in
    # bucket 0, matching the NULLS FIRST order of the window fallback.
    sample = sorted(
        tuple(r)
        for r in df.select(*order_cols).na.drop().sample(fraction, seed).collect()
    )
    if len(sample) < 2 * n_buckets:
        n_buckets = max(1, len(sample) // 2)
    stride = len(sample) / n_buckets
    bounds = sorted({sample[int(i * stride)] for i in range(1, n_buckets)})
    return bounds


def _bucket_expr(order_cols: list[str], bounds: list[tuple]) -> Column:
    """Bucket id = count of boundary tuples <= this row's key tuple.

    A pure row-local expression (lexicographic struct comparison against
    literals) — deterministic across plan re-executions, unlike
    ``spark_partition_id`` after ``repartitionByRange``.
    """
    if not bounds:
        return F.lit(0)
    key = F.struct(*[F.col(c) for c in order_cols])
    lits = F.array(
        *[F.struct(*[F.lit(v).alias(c) for c, v in zip(order_cols, b)]) for b in bounds]
    )
    return F.size(F.filter(lits, lambda b: b <= key))


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    rows_per_bucket: int = 1_000_000,
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """Append an exact global ``row_number`` over ``ORDER BY
    order_cols ASC`` — identical to the single-partition window, but
    computed across the cluster.

    ``order_cols`` must form a total order (append a unique key as the
    last column).  ``rows_per_bucket`` tunes bucket granularity: inputs
    at or under it keep the plain single-window plan (correct and
    cheapest for small/dimension inputs).  ``n_rows``: pass the input's
    row count if the caller already knows it (saves one job).
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    asc = [F.col(c).asc() for c in order_cols]
    bounds = _boundaries(df, order_cols, rows_per_bucket, seed, n_rows=n_rows)
    if not bounds:
        w = Window.orderBy(*asc)
        return df.withColumn(rank_col, F.row_number().over(w).cast("bigint"))

    bucketed = df.withColumn("_rank_bucket", _bucket_expr(order_cols, bounds))
    counts = sorted(
        (r["_rank_bucket"], r["n"])
        for r in bucketed.groupBy("_rank_bucket").agg(F.count("*").alias("n")).collect()
    )
    offsets: dict[int, int] = {}
    running = 0
    for b, n in counts:
        offsets[b] = running
        running += n
    offset_map = F.create_map(
        *chain.from_iterable((F.lit(b), F.lit(o)) for b, o in offsets.items())
    )
    w = Window.partitionBy("_rank_bucket").orderBy(*asc)
    return (
        bucketed.withColumn("_local", F.row_number().over(w))
        .withColumn(
            rank_col,
            (offset_map[F.col("_rank_bucket")] + F.col("_local")).cast("bigint"),
        )
        .drop("_rank_bucket", "_local")
    )


def exact_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str],
    tile_col: str = "tile",
    rows_per_bucket: int = 1_000_000,
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """Append ``NTILE(n_tiles) OVER (ORDER BY order_cols ASC)`` computed
    distributedly, bit-exact with the SQL window function.

    SQL NTILE semantics over c rows: the first ``c % n`` tiles hold
    ``c//n + 1`` rows, the remaining tiles ``c//n`` rows.  Both branches
    are closed-form in the global rank, so after `with_global_rank` this
    is a map-only projection.

    ``n_rows``: pass the input's row count when the caller already knows
    it — chained rank passes over the same (checkpointed) input share
    one count job instead of paying one each.
    """
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    # ONE count serves both the bucket decision and the tile closed
    # form (chained rank passes otherwise pay a redundant job each)
    c = df.count() if n_rows is None else n_rows
    ranked = with_global_rank(
        df, order_cols, rank_col="_grank",
        rows_per_bucket=rows_per_bucket, seed=seed, n_rows=c,
    )
    q, r = divmod(c, n_tiles)
    big = q + 1  # size of the first r tiles
    rank = F.col("_grank")
    if q == 0:  # fewer rows than tiles: tile == rank
        tile = rank
    else:
        tile = F.when(
            rank <= r * big, F.ceil(rank / F.lit(big))
        ).otherwise(F.lit(r) + F.ceil((rank - F.lit(r * big)) / F.lit(q)))
    return ranked.withColumn(tile_col, tile.cast("int")).drop("_grank")


def exact_ntile_multi(
    df: DataFrame,
    n_tiles: int,
    dims: "list[tuple[list[str], str]]",
    rows_per_bucket: int = 1_000_000,
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """Several ``exact_ntile`` passes over the SAME input, sharing the
    driver-side jobs (r13: guide §1.2 — don't repeat passes over the
    data).  ``dims`` is a list of ``(order_cols, tile_col)``.

    Chained single-dimension calls pay one boundary-sample job and one
    bucket-count job PER dimension — 2·d extra scans of the input.
    This form runs ONE sample job that collects the union of every
    dimension's order columns and ONE count job that histograms all
    dimensions at once (posexplode of the d bucket ids → a ≤ d·256-row
    aggregate).  The ranked output is BIT-IDENTICAL to the chained
    calls: global rank = bucket offset + in-bucket row_number is exact
    for ANY monotone boundary set, so sharing the sample can only move
    bucket *boundaries*, never a rank or a tile.

    The window passes themselves are unchanged — one hash exchange per
    dimension, every bucket ranked in parallel.
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    c = df.count() if n_rows is None else n_rows
    all_cols: list[str] = []
    for order_cols, _ in dims:
        if not order_cols:
            raise ValueError("order_cols must be non-empty")
        for col in order_cols:
            if col not in all_cols:
                all_cols.append(col)

    # ONE seeded sample job over the union of order columns; each
    # dimension derives its boundaries from its own NULL-free tuples
    # (same stride rule as _boundaries).
    per_dim_bounds: list[list[tuple]] = [[] for _ in dims]
    if c > rows_per_bucket:
        n_buckets = min(_MAX_BUCKETS, max(2, c // rows_per_bucket))
        oversample = 32
        fraction = min(1.0, (n_buckets * oversample) / c)
        sample_rows = df.select(*all_cols).sample(fraction, seed).collect()
        for di, (order_cols, _) in enumerate(dims):
            sample = sorted(
                t
                for t in (
                    tuple(r[col] for col in order_cols) for r in sample_rows
                )
                if all(v is not None for v in t)
            )
            nb = n_buckets
            if len(sample) < 2 * nb:
                nb = max(1, len(sample) // 2)
            if nb <= 1 or not sample:
                continue
            stride = len(sample) / nb
            per_dim_bounds[di] = sorted(
                {sample[int(i * stride)] for i in range(1, nb)}
            )

    bucket_exprs = [
        _bucket_expr(order_cols, per_dim_bounds[di])
        for di, (order_cols, _) in enumerate(dims)
    ]
    # ONE count job: histogram every dimension's bucket ids in a single
    # pass (explode to (dim, bucket) rows — map-side combined down to
    # ≤ d·_MAX_BUCKETS rows before the exchange).
    need_counts = [di for di in range(len(dims)) if per_dim_bounds[di]]
    offsets_by_dim: dict[int, dict[int, int]] = {}
    if need_counts:
        hist = (
            df.select(
                F.posexplode(
                    F.array(*[bucket_exprs[di] for di in need_counts])
                ).alias("_dim", "_bucket")
            )
            .groupBy("_dim", "_bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        for pos, di in enumerate(need_counts):
            counts = sorted(
                (r["_bucket"], r["n"]) for r in hist if r["_dim"] == pos
            )
            offsets: dict[int, int] = {}
            running = 0
            for b, n in counts:
                offsets[b] = running
                running += n
            offsets_by_dim[di] = offsets

    q, r = divmod(c, n_tiles)
    big = q + 1
    out = df
    for di, (order_cols, tile_col) in enumerate(dims):
        asc = [F.col(col).asc() for col in order_cols]
        if not per_dim_bounds[di]:
            w = Window.orderBy(*asc)
            rank = F.row_number().over(w).cast("bigint")
            out = out.withColumn("_grank", rank)
        else:
            offset_map = F.create_map(
                *chain.from_iterable(
                    (F.lit(b), F.lit(o))
                    for b, o in offsets_by_dim[di].items()
                )
            )
            bucketed = out.withColumn("_rank_bucket", bucket_exprs[di])
            w = Window.partitionBy("_rank_bucket").orderBy(*asc)
            out = (
                bucketed.withColumn("_local", F.row_number().over(w))
                .withColumn(
                    "_grank",
                    (
                        offset_map[F.col("_rank_bucket")] + F.col("_local")
                    ).cast("bigint"),
                )
                .drop("_rank_bucket", "_local")
            )
        rank = F.col("_grank")
        if q == 0:
            tile = rank
        else:
            tile = F.when(
                rank <= r * big, F.ceil(rank / F.lit(big))
            ).otherwise(F.lit(r) + F.ceil((rank - F.lit(r * big)) / F.lit(q)))
        out = out.withColumn(tile_col, tile.cast("int")).drop("_grank")
    return out
