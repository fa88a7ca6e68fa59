"""Deterministic sampling operators for corpus curation.

Training-data pipelines never use RNG sampling (`df.sample`) for
anything that must be reproducible: re-running the pipeline, adding a
machine, or re-partitioning the input would change the sample.  The
portable idiom is HASH-GATE sampling — keep a row iff
``hash(salt || key) % D < rate·D`` — which is:

- deterministic across engines, runs, partitionings, and cluster sizes;
- map-only (zero shuffle at any scale: the gate is a per-row filter
  that pushes down to the scan);
- composable: different salts give independent samples, the same salt
  gives consistent inclusion across tables (sample a user's EVERY row
  by keying on user_id).

The hash is the portable MD5-derived family from ``functions.hashing``
so the DuckDB oracle reproduces the exact sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int28

DENOM = 10_000  # rate resolution: 0.01%


def hash_gate(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean inclusion gate: deterministic ``rate`` fraction of keys."""
    bucket = md5_int28(F.concat(F.lit(salt), key.cast("string"))) % DENOM
    return bucket < F.lit(int(round(rate * DENOM)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic downsampling (corpus mixing).

    ``rates`` maps stratum values (e.g. language, source domain) to
    keep-fractions — the public corpus-mixture move: downweight the
    over-represented crawl slice, keep all of the rare one.  The gate
    is a single CASE over the stratum column; Catalyst folds it into
    the scan filter, so at 100 TB this is a pushed-down map-only pass.
    """
    rate_expr: Column = F.lit(default_rate)
    for value, rate in sorted(rates.items()):
        rate_expr = F.when(F.col(stratum_col) == value, F.lit(rate)).otherwise(
            rate_expr
        )
    bucket = md5_int28(F.concat(F.lit(salt), F.col(key_col).cast("string"))) % DENOM
    return df.filter(bucket < (rate_expr * DENOM).cast("int"))


def cap_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group document cap (anti-domination curation:
    no single source/domain may contribute more than ``cap`` docs).

    Rank within each group by the portable hash of the key (a
    deterministic shuffle of the group, NOT arrival order — arrival
    order is partitioning-dependent and would make the kept set
    irreproducible), tie-broken by the key itself, and keep rank <=
    cap.

    Scale note: one shuffle on the group key; each group ranks inside
    one task, so a mega-group (a domain with 10^9 docs at 100 TB)
    hot-spots.  For those, pre-gate with ``hash_gate(key,
    ~cap/n_group)`` per group to shrink the window input to O(cap)
    first — the exact window then runs on survivors only.

    Output: input columns + ``group_rank``.
    """
    from pyspark.sql import Window

    h = md5_int28(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("group_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("group_rank") <= cap)
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k items
    (Efraimidis–Spirakis A-ES): each row gets the key
    ``ln(u) / w`` with ``u = (hash(salt||key)+1) / 2^28`` ∈ (0,1],
    and the k largest keys are the sample — equivalent to drawing k
    items sequentially with probability ∝ weight, but embarrassingly
    parallel.

    Scale shape: map (hash + ln) then distributed top-k —
    ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject (per-
    partition heaps merged on the driver), NOT a global sort; no
    shuffle of the full input at any scale.

    Output: input columns + ``sample_key`` (the A-ES key, unrounded).

    Rows with NULL or non-positive weight are excluded up front: A-ES
    assigns them zero selection probability, and dividing by w=0 is a
    hard error under ANSI mode (routine dirty-data at scale — a NULL
    length column — must not kill the sampling job).
    """
    df = df.filter(F.col(weight_col) > 0)
    u = (
        md5_int28(F.concat(F.lit(salt), F.col(key_col).cast("string"))) + F.lit(1)
    ) / F.lit(float(1 << 28))
    key = F.ln(u) / F.col(weight_col)
    return (
        df.withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(key_col).asc())
        .limit(k)
    )


def global_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards.

    Training-data writers need the corpus in a REPRODUCIBLE random
    order (epoch shuffling baked into the layout): shard by one
    portable hash of the key, order within each shard by a second,
    independent hash.  The composition is a fixed pseudorandom
    permutation of the corpus — identical on every run, cluster size,
    and engine, unlike ``df.orderBy(rand())``.

    Scale shape: exactly the shape of a shuffle write — one exchange
    on ``shard`` (each shard = one reducer partition at scale; set
    ``spark.sql.shuffle.partitions`` ≥ n_shards) and a per-shard sort.
    ``row_number`` over ``partitionBy(shard)`` plans a single
    Exchange(shard) + Sort(pos key), no global total-order sort ever
    materializes.  For 100 TB pick n_shards so a shard ~ 1-4 GB
    (e.g. 50k shards), keeping every sort in-memory.

    Output: input columns + ``shard`` (int) + ``pos`` (1-based rank
    within the shard).
    """
    from pyspark.sql import Window

    shard_h = md5_int28(F.concat(F.lit(salt + ":s"), F.col(key_col).cast("string")))
    pos_h = md5_int28(F.concat(F.lit(salt + ":p"), F.col(key_col).cast("string")))
    w = Window.partitionBy("shard").orderBy(pos_h.asc(), F.col(key_col).asc())
    return df.withColumn(
        "shard", (shard_h % F.lit(n_shards)).cast("int")
    ).withColumn("pos", F.row_number().over(w).cast("int"))


def token_budget_plan(
    df: DataFrame,
    source_col: str,
    text_col: str,
    budget: int,
    max_epochs: int,
    weight_power: float = 0.5,
) -> DataFrame:
    """Epoch allocation under a token budget (the LLaMA/DoReMi-style
    planning step downstream of mixture weights): each source gets
    ``budget * weight`` tokens, where weight ∝ n_docs^weight_power
    (0.5 = the sqrt temper that upweights small high-quality sources),
    capped at ``max_epochs`` passes over what the source actually has;
    ``epochs = planned / available``.

    All comparisons and caps are BIGINT (Spark truncates
    double→bigint casts where DuckDB rounds — integer arithmetic
    sidesteps the engine difference).  Plan shape: one tiny per-source
    aggregate + one broadcast scalar (the weight normalizer) — free at
    any corpus size; the only pass over data is the token count.

    Output: source_col, n_docs, n_tokens, weight, planned_tokens,
    epochs, truncated.
    """
    from ..functions.text import tokens_expr

    per = df.groupBy(source_col).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens_expr(F.col(text_col))))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = per.agg(
        F.sum(F.pow(F.col("n_docs"), F.lit(float(weight_power)))).alias("_tot")
    )
    w = per.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(
            F.pow(F.col("n_docs"), F.lit(float(weight_power))) / F.col("_tot"), 6
        ).alias("weight"),
    )
    ideal = F.floor(F.lit(int(budget)) * F.col("weight")).cast("bigint")
    cap = F.lit(int(max_epochs)).cast("bigint") * F.col("n_tokens")
    planned = F.least(ideal, cap)
    # A source whose surviving docs all tokenize empty (possible after
    # span removal) has n_docs > 0 but n_tokens = 0: its plan is 0
    # tokens / 0 epochs, not a NULL/NaN from 0-division.
    epochs = F.when(
        F.col("n_tokens") > 0,
        F.round(planned / F.col("n_tokens").cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return w.select(
        "*",
        planned.alias("planned_tokens"),
        epochs.alias("epochs"),
        (ideal > cap).alias("truncated"),
    )
