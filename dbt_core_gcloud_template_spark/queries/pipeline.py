"""Corpus-curation pipeline queries: contamination, repetition,
sampling, PII redaction, embedding compression — the operators a
large-scale training-data pipeline runs between raw crawl and training
shards, each with a DuckDB oracle built from the same frozen constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles_sql, tokens_sql
from ..operators import contamination, sampling, similarity, text_analysis
from ..operators.text_analysis import PII_EMAIL, PII_PHONE
from ..sources.registry import load_table
from . import register

_TOK = tokens_sql("text")


def _h28(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 7))::BIGINT)"


def _h60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# docs_contamination — train/test split leakage via shared 5-gram
# shingles (decontamination check; operators/contamination.py).  The
# split is the same deterministic 90/5/5 hash split as
# docs_split_assignment; eval = the 'test' bucket.
# ---------------------------------------------------------------------------
_K_CONTAM = 5


@register(
    "docs_contamination",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_h28("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
             {shingles_sql(_TOK, _K_CONTAM)} AS sh
      FROM documents
    ),
    te AS (
      SELECT doc_id, len(sh) AS n_sh, {_h60("unnest(sh)")} AS shingle
      FROM s WHERE bucket >= 95 AND len(sh) > 0
    ),
    tr AS (
      SELECT DISTINCT {_h60("unnest(sh)")} AS shingle
      FROM s WHERE bucket < 90
    )
    SELECT te.doc_id,
           CAST(max(te.n_sh) AS INT) AS n_shingles,
           CAST(count(tr.shingle) AS BIGINT) AS n_overlap,
           CAST(round(count(tr.shingle) * 1.0 / max(te.n_sh), 6) AS DOUBLE)
             AS contamination,
           count(tr.shingle) * 1.0 / max(te.n_sh) >= 0.2 AS is_contaminated
    FROM te LEFT JOIN tr ON te.shingle = tr.shingle
    GROUP BY te.doc_id
    """,
)
def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int28

    d = load_table(spark, sf_dir, "documents")
    bucket = md5_int28(F.col("doc_id").cast("string")) % 100
    return contamination.ngram_contamination(
        d,
        "doc_id",
        "text",
        is_eval=bucket >= 95,
        is_train=bucket < 90,
        k_shingle=_K_CONTAM,
        flag_threshold=0.2,
    )


# ---------------------------------------------------------------------------
# docs_repetition — Gopher-style within-document repetition filters
# (operators/text_analysis.repetition_stats).
# ---------------------------------------------------------------------------
@register(
    "docs_repetition",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOK} AS tok FROM documents
    ), m AS (
      SELECT doc_id,
             len(tok) AS n,
             len(tok) - 1 AS n_bigrams,
             len({shingles_sql("tok", 2)}) AS n_distinct_bg,
             list_max(list_transform(list_distinct(tok),
                      d -> len(list_filter(tok, t -> t = d)))) AS top_cnt
      FROM t WHERE len(tok) >= 2
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           CAST(round(1.0 - n_distinct_bg * 1.0 / n_bigrams, 6) AS DOUBLE)
             AS dup_bigram_frac,
           CAST(round(top_cnt * 1.0 / n, 6) AS DOUBLE) AS top_token_ratio,
           (1.0 - n_distinct_bg * 1.0 / n_bigrams) > 0.2
             OR (top_cnt * 1.0 / n) > 0.2 AS is_repetitive
    FROM m
    """,
)
def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.repetition_stats(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# docs_stratified_sample — deterministic per-language downsampling
# (operators/sampling.stratified_sample): keep 40% of 'en', 100% of the
# rest, then report the per-language mixture.  Hash-gated, never RNG.
# ---------------------------------------------------------------------------
_RATES = {"en": 0.4}


@register(
    "docs_stratified_sample",
    oracle=f"""
    WITH s AS (
      SELECT lang,
             {_h28("'strat' || CAST(doc_id AS VARCHAR)")} % {sampling.DENOM}
               AS bucket
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN bucket <
                 CAST((CASE WHEN lang = 'en' THEN 0.4 ELSE 1.0 END)
                      * {sampling.DENOM} AS INT)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM s GROUP BY lang ORDER BY lang
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    kept = sampling.stratified_sample(d, "doc_id", "lang", _RATES)
    totals = d.groupBy("lang").agg(F.count("*").alias("n_total"))
    sampled = kept.groupBy("lang").agg(F.count("*").alias("n_sampled"))
    return (
        totals.join(sampled, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# docs_pii_redaction — regex PII scrub (operators/text_analysis.
# redact_pii).  The synthetic corpus has no PII, so the query plants
# deterministic contact strings first — the operator under test is the
# redaction chain, not the data.
# ---------------------------------------------------------------------------
@register(
    "docs_pii_redaction",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-01' || CAST(doc_id % 10 AS VARCHAR)
                  || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
      FROM documents
    ), r AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
             regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS after_email
      FROM p
    )
    SELECT doc_id,
           CAST(n_emails AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(after_email, '{PII_PHONE}')) AS BIGINT)
             AS n_phones,
           md5(regexp_replace(after_email, '{PII_PHONE}', '<PHONE>', 'g'))
             AS clean_md5
    FROM r
    """,
)
def docs_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-01"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("text"),
    )
    red = text_analysis.redact_pii(planted, "doc_id", "text")
    return red.select(
        "doc_id", "n_emails", "n_phones", F.md5("clean_text").alias("clean_md5")
    )


# ---------------------------------------------------------------------------
# embedding_quantize — int8 scalar quantization + reconstruction error
# (operators/similarity.quantize_int8).  Codes are summed into a
# checksum for the hash gate (the full array column is exercised by the
# operator's own tests).
# ---------------------------------------------------------------------------
@register(
    "embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v,
             list_min(list_transform(embedding, x -> x::DOUBLE)) AS lo,
             list_max(list_transform(embedding, x -> x::DOUBLE)) AS hi
      FROM embeddings
    ), q AS (
      SELECT vec_id, v, lo, hi, (hi - lo) / 255.0 AS scale,
             list_transform(v, x ->
               CASE WHEN hi > lo
                    THEN CAST(floor((x - lo) / ((hi - lo) / 255.0) + 0.5) AS INT)
                    ELSE 0 END) AS codes
      FROM v
    )
    SELECT vec_id,
           CAST(len(v) AS INT) AS n_dims,
           CAST(round(lo, 6) AS DOUBLE) AS lo,
           CAST(round(hi, 6) AS DOUBLE) AS hi,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(round(list_sum(list_transform(generate_series(1, len(v)),
                 i -> pow(v[i] - (lo + codes[i] * scale), 2))) / len(v), 8)
                AS DOUBLE) AS mse
    FROM q
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_int8(e, "vec_id", "embedding")
    return q.select(
        "vec_id",
        "n_dims",
        "lo",
        "hi",
        F.aggregate("codes", F.lit(0).cast("bigint"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        "mse",
    )


# ---------------------------------------------------------------------------
# embedding_centroids — per-label mean vector, long form (the k-means
# update step; operators/similarity.label_centroids).  Exact DECIMAL
# component sums make the across-row aggregation order-independent.
# ---------------------------------------------------------------------------
@register(
    "embedding_centroids",
    oracle="""
    SELECT label,
           CAST(i - 1 AS INT) AS dim,
           CAST(round(CAST(sum(CAST(embedding[i] AS DECIMAL(28,9))) AS DOUBLE)
                      / count(*), 6) AS DOUBLE) AS centroid,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
    GROUP BY label, i
    ORDER BY label, dim
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_centroids(
        load_table(spark, sf_dir, "embeddings"), "embedding", "label"
    )


# ---------------------------------------------------------------------------
# docs_weighted_sample — A-ES weighted sampling without replacement:
# 100 docs with inclusion probability ∝ n_chars, fully deterministic
# (operators/sampling.py weighted_sample_topk).  Map + distributed
# top-k; no global sort at any scale.
# ---------------------------------------------------------------------------
_AES_KEY_SQL = (
    "ln(((('0x' || substr(md5('wsample' || doc_id::VARCHAR), 1, 7))::BIGINT) + 1)"
    " / 268435456.0) / n_chars"
)


@register(
    "docs_weighted_sample",
    oracle=f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           round({_AES_KEY_SQL}, 6) + 0.0 AS sample_key
    FROM documents
    ORDER BY {_AES_KEY_SQL} DESC, doc_id
    LIMIT 100
    """,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sampled = sampling.weighted_sample_topk(docs, "doc_id", "n_chars", k=100)
    # + 0.0 normalizes IEEE -0.0: a near-1 hash makes the A-ES key a
    # tiny negative that rounds to negative zero in DuckDB but positive
    # zero in Spark (first seen at sf0.1) — the canonical hash differs
    # on the sign of zero unless both sides normalize.
    return sampled.select(
        "doc_id",
        "source",
        "n_chars",
        (F.round("sample_key", 6) + F.lit(0.0)).alias("sample_key"),
    )


# ---------------------------------------------------------------------------
# docs_mixture_weights — temperature-smoothed source mixture (the
# multilingual-corpus sampling rule: p_i ∝ n_i^alpha, alpha=0.5 —
# upweights rare sources, tempers dominant ones).  Per-source agg +
# broadcast of the 1-row total; no window over an unpartitioned frame.
# ---------------------------------------------------------------------------
@register(
    "docs_mixture_weights",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOK})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           round(pow(n_docs, 0.5) / (SELECT sum(pow(n_docs, 0.5)) FROM s), 6)
             AS weight
    FROM s
    """,
)
def docs_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_expr(F.col("text")))).cast("bigint").alias("n_tokens"),
    )
    tot = per.agg(F.sum(F.pow(F.col("n_docs"), F.lit(0.5))).alias("_tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.pow(F.col("n_docs"), F.lit(0.5)) / F.col("_tot"), 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# docs_global_shuffle — deterministic epoch-shuffle layout: shard by one
# portable hash, order within shard by an independent second hash
# (operators/sampling.global_shuffle).  Spark plan: one Exchange(shard)
# + per-shard sort — exactly a shuffle-write's shape, no global sort.
# ---------------------------------------------------------------------------
_N_SHARDS = 8


@register(
    "docs_global_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {_h28("'shuf:s' || CAST(doc_id AS VARCHAR)")} % {_N_SHARDS} AS shard,
             {_h28("'shuf:p' || CAST(doc_id AS VARCHAR)")} AS ph
      FROM documents
    )
    SELECT doc_id,
           CAST(shard AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY shard ORDER BY ph ASC, doc_id ASC
           ) AS INT) AS pos
    FROM h
    """,
)
def docs_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return sampling.global_shuffle(docs, "doc_id", _N_SHARDS).select(
        "doc_id", "shard", "pos"
    )


# ---------------------------------------------------------------------------
# docs_dup_ngrams — RefinedWeb-style duplicated-span signal: per-doc
# fraction of distinct 3-grams that occur in >=2 documents corpus-wide
# (operators/dedup.dup_ngram_stats).
# ---------------------------------------------------------------------------
_DUP_K, _DUP_DF = 3, 2


@register(
    "docs_dup_ngrams",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {shingles_sql(_TOK, _DUP_K)} AS sh FROM documents
    ),
    g AS (SELECT doc_id, unnest(sh) AS gram FROM t),
    dfq AS (SELECT gram, count(*) AS doc_freq FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN dfq.doc_freq >= {_DUP_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_grams,
           round(sum(CASE WHEN dfq.doc_freq >= {_DUP_DF} THEN 1 ELSE 0 END)
                 / count(*), 6) AS dup_frac
    FROM g JOIN dfq USING (gram)
    GROUP BY g.doc_id
    """,
)
def docs_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as _dedup

    return _dedup.dup_ngram_stats(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k_shingle=_DUP_K,
        df_threshold=_DUP_DF,
    )


# ---------------------------------------------------------------------------
# corpus_term_entropy — per-language unigram-distribution health:
# vocabulary size, type-token ratio, Shannon entropy, Zipf head share
# (operators/text_analysis.term_distribution_stats).
# ---------------------------------------------------------------------------
_ENT_TOP = 10


@register(
    "corpus_term_entropy",
    oracle=f"""
    WITH tk AS (SELECT lang, unnest({_TOK}) AS term FROM documents),
    terms AS (SELECT lang, term, count(*) AS c FROM tk GROUP BY lang, term),
    e AS (
      SELECT lang, c,
             sum(c) OVER (PARTITION BY lang) AS n_tokens,
             count(*) OVER (PARTITION BY lang) AS n_types,
             row_number() OVER (
               PARTITION BY lang ORDER BY c DESC, term ASC
             ) AS rnk
      FROM terms
    )
    SELECT lang,
           CAST(any_value(n_tokens) AS BIGINT) AS n_tokens,
           CAST(any_value(n_types) AS BIGINT) AS n_types,
           round(any_value(n_types) / any_value(n_tokens), 6) AS ttr,
           round(-sum((c / n_tokens) * log2(c / n_tokens)), 6)
             AS entropy_bits,
           round(sum(CASE WHEN rnk <= {_ENT_TOP} THEN c ELSE 0 END)
                 / any_value(n_tokens), 6) AS top{_ENT_TOP}_share
    FROM e
    GROUP BY lang
    """,
)
def corpus_term_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.term_distribution_stats(
        load_table(spark, sf_dir, "documents"), "text", "lang", top_n=_ENT_TOP
    )


# ---------------------------------------------------------------------------
# docs_dup_ngrams_capped — the skew-clamped variant: grams with doc
# frequency above df_cap are dropped from BOTH sides of the stats (the
# 100 TB posting-list bound; operators/dedup.dup_ngram_stats df_cap).
# Cap chosen low enough that the gate data actually exercises the clamp.
# ---------------------------------------------------------------------------
_DUP_CAP = 4


@register(
    "docs_dup_ngrams_capped",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {shingles_sql(_TOK, _DUP_K)} AS sh FROM documents
    ),
    g AS (SELECT doc_id, unnest(sh) AS gram FROM t),
    dfq AS (
      SELECT gram, count(*) AS doc_freq FROM g GROUP BY gram
      HAVING count(*) <= {_DUP_CAP}
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN dfq.doc_freq >= {_DUP_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_grams,
           round(sum(CASE WHEN dfq.doc_freq >= {_DUP_DF} THEN 1 ELSE 0 END)
                 / count(*), 6) AS dup_frac
    FROM g JOIN dfq USING (gram)
    GROUP BY g.doc_id
    """,
)
def docs_dup_ngrams_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as _dedup

    return _dedup.dup_ngram_stats(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k_shingle=_DUP_K,
        df_threshold=_DUP_DF,
        df_cap=_DUP_CAP,
    )


# ---------------------------------------------------------------------------
# docs_dup_rate_by_source — curation dashboard: per-source share of
# documents whose text is an exact duplicate of any other document
# (corpus-wide hashes, source-level rollup).  Only 32-char digests
# shuffle; the rate separates "spammy mirror" sources from clean ones
# before mixture weighting.
# ---------------------------------------------------------------------------
@register(
    "docs_dup_rate_by_source",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, md5(text) AS th FROM documents
    ),
    freq AS (SELECT th, count(*) AS n FROM h GROUP BY th)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN freq.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicated,
           round(sum(CASE WHEN freq.n > 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS dup_rate
    FROM h JOIN freq USING (th)
    GROUP BY source
    """,
)
def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("th")
    )
    freq = d.groupBy("th").agg(F.count("*").alias("n"))
    return (
        d.join(freq, "th")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("n") > 1).cast("bigint")).cast("bigint").alias(
                "n_duplicated"
            ),
            F.round(
                F.sum((F.col("n") > 1).cast("bigint")) / F.count("*"), 6
            ).alias("dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# docs_token_budget_plan — epoch allocation under a token budget (the
# LLaMA/DoReMi-style planning step downstream of mixture weights): each
# source gets budget*weight tokens, capped at MAX_EPOCHS passes over
# what it has; epochs = planned/available.  All comparisons and caps in
# BIGINT (Spark truncates double->bigint casts, DuckDB rounds — integer
# arithmetic sidesteps the engine difference).  Tiny per-source
# aggregate + one broadcast scalar: free at any corpus size.
# ---------------------------------------------------------------------------
_PLAN_BUDGET = 100_000  # tokens — sized so the sf fixtures exercise BOTH
#                         branches (some sources hit the epoch cap, some
#                         take their full ideal share)
_PLAN_MAX_EPOCHS = 4    # integer cap: planned <= MAX_EPOCHS * available


@register(
    "docs_token_budget_plan",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOK})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, n_tokens,
             round(pow(n_docs, 0.5) / (SELECT sum(pow(n_docs, 0.5)) FROM s), 6)
               AS weight
      FROM s
    ),
    p AS (
      SELECT source, n_docs, n_tokens, weight,
             CAST(floor({_PLAN_BUDGET} * weight) AS BIGINT) AS ideal_tokens
      FROM w
    )
    SELECT source, n_docs, n_tokens, weight,
           least(ideal_tokens, {_PLAN_MAX_EPOCHS} * n_tokens)
             AS planned_tokens,
           CASE WHEN n_tokens > 0
                THEN round(least(ideal_tokens, {_PLAN_MAX_EPOCHS} * n_tokens)
                           / CAST(n_tokens AS DOUBLE), 6)
                ELSE 0.0 END AS epochs,
           ideal_tokens > {_PLAN_MAX_EPOCHS} * n_tokens AS truncated
    FROM p
    """,
)
def docs_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import token_budget_plan

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_plan(
        docs, "source", "text", budget=_PLAN_BUDGET, max_epochs=_PLAN_MAX_EPOCHS
    )
