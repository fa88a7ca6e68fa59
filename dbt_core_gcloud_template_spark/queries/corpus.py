"""Corpus-preparation queries: chunking, packing, term weighting,
retrieval, n-gram counts, and the end-to-end curation funnel.

These extend the LLM-pipeline surface (SURVEY.md §7.6) with the
remaining standard pretraining-corpus operations: long-document
chunking, sequence packing, TF-IDF/BM25 lexical scoring, corpus
bigram statistics, and a multi-stage curation funnel that composes
quality filtering + exact dedup + near-dedup into one plan.

Every oracle mirrors the Spark arithmetic operation-for-operation
(same association order, same rounding) so IEEE doubles agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import LANG_STOPWORDS
from ..operators import chunking, dedup, ranking, text_analysis
from ..sources.registry import load_table
from . import register

_TOK = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------------
# docs_chunked — sliding-window token chunks (chunk_size=16, stride=12).
# Map-only: sequence/transform/slice + one explode, no shuffle.
# ---------------------------------------------------------------------------
_CHUNK, _STRIDE = 16, 12


@register(
    "docs_chunked",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (SELECT doc_id, tok, len(tok) AS n FROM t WHERE len(tok) > 0),
    c AS (
      SELECT doc_id, tok,
             greatest(1, CAST(ceil((n - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) + 1)
               AS n_chunks
      FROM b
    ),
    e AS (
      SELECT doc_id, tok, unnest(generate_series(0, n_chunks - 1)) AS i
      FROM c
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           CAST(len(tok[(i*{_STRIDE}+1):(i*{_STRIDE}+{_CHUNK})]) AS INT)
             AS n_chunk_tokens,
           array_to_string(tok[(i*{_STRIDE}+1):(i*{_STRIDE}+{_CHUNK})], ' ')
             AS chunk_text
    FROM e
    """,
)
def docs_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunking.chunk_documents(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        chunk_size=_CHUNK,
        stride=_STRIDE,
    )


# ---------------------------------------------------------------------------
# docs_packed_sequences — concatenate-then-split packing into 64-token
# training sequences, parallel per language shard.
# ---------------------------------------------------------------------------
_SEQ_LEN = 64


@register(
    "docs_packed_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, len({_TOK}) AS n FROM documents),
    b AS (
      SELECT doc_id, lang, CAST(least(n, {_SEQ_LEN}) AS BIGINT) AS clipped
      FROM t WHERE n > 0
    ),
    a AS (
      SELECT lang, doc_id, clipped,
             CAST(floor(coalesce(sum(clipped) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / {_SEQ_LEN}) AS BIGINT) AS seq_no
      FROM b
    )
    SELECT lang, seq_no,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(clipped) AS BIGINT) AS n_tokens,
           round(sum(clipped) / {_SEQ_LEN}.0, 6) AS fill_ratio
    FROM a GROUP BY lang, seq_no
    """,
)
def docs_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunking.pack_sequences(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        seq_len=_SEQ_LEN,
        partition_col="lang",
    )


# ---------------------------------------------------------------------------
# docs_tfidf_terms — per-document top-5 terms by TF-IDF.
# ---------------------------------------------------------------------------
@register(
    "docs_tfidf_terms",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (SELECT doc_id, tok FROM t WHERE len(tok) > 0),
    tc AS (SELECT doc_id, unnest(tok) AS term FROM b),
    cnt AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tc GROUP BY 1, 2
    ),
    stats AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM cnt GROUP BY 1),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM b),
    scored AS (
      SELECT c.doc_id, c.term, c.tf, s.df,
             round(c.tf * ln(CAST(n_docs AS DOUBLE) / s.df), 6) AS tfidf
      FROM cnt c JOIN stats s USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def docs_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ranking.tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", top_k=5
    )


# ---------------------------------------------------------------------------
# docs_bm25_search — BM25 retrieval for a fixed query-term bag, top-20.
# ---------------------------------------------------------------------------
_BM25_TERMS = ["table", "join", "hash", "scan"]
_K1, _B = 1.2, 0.75


@register(
    "docs_bm25_search",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (
      SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS dl
      FROM t WHERE len(tok) > 0
    ),
    corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM b),
    post AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(tok) AS term FROM b)
      WHERE term IN ({", ".join(f"'{w}'" for w in _BM25_TERMS)})
      GROUP BY 1, 2
    ),
    tdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
    scored AS (
      SELECT p.doc_id,
             CAST(count(*) AS BIGINT) AS n_hit_terms,
             round(sum(
               ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
               * ((p.tf * ({_K1} + 1)) /
                  (p.tf + {_K1} * ((1.0 - {_B}) + (({_B} * b2.dl) / avgdl))))
             ), 6) AS score
      FROM post p
      JOIN tdf USING (term)
      JOIN b b2 USING (doc_id)
      CROSS JOIN corpus
      GROUP BY p.doc_id
    )
    SELECT doc_id, n_hit_terms, score, rank FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
               AS rank
      FROM scored
    ) WHERE rank <= 20
    """,
)
def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ranking.bm25_scores(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        _BM25_TERMS,
        k1=_K1,
        b=_B,
        top_n=20,
    )


# ---------------------------------------------------------------------------
# corpus_bigrams — corpus bigram frequencies (n-gram LM counts), top-40.
# ---------------------------------------------------------------------------
@register(
    "corpus_bigrams",
    oracle=f"""
    WITH t AS (SELECT {_TOK} AS tok FROM documents),
    b AS (SELECT tok FROM t WHERE len(tok) >= 2),
    g AS (
      SELECT unnest(list_transform(generate_series(1, len(tok) - 1),
               i -> concat(tok[i], ' ', tok[i+1]))) AS bigram
      FROM b
    ),
    c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n_occurrences
          FROM g GROUP BY 1)
    SELECT bigram, n_occurrences, rank FROM (
      SELECT *, CAST(row_number() OVER (
               ORDER BY n_occurrences DESC, bigram) AS INT) AS rank
      FROM c
    ) WHERE rank <= 40
    """,
)
def corpus_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ranking.bigram_counts(
        load_table(spark, sf_dir, "documents"), "text", top_n=40
    )


# ---------------------------------------------------------------------------
# docs_curation_funnel — the end-to-end curation pipeline as ONE plan:
# token-length filter → quality filter → exact dedup → near-dedup,
# reporting survivor counts per stage.  Composes quality_score,
# exact_dedup, and ngram_jaccard_pairs/canonical_ids; Catalyst fuses
# the shared scans.  Each stage's count is docs passing ALL filters up
# to and including that stage (a monotone funnel).
# ---------------------------------------------------------------------------
def _funnel_oracle() -> str:
    stop_list = _sql_list(LANG_STOPWORDS["en"])
    return f"""
    WITH q0 AS (
      SELECT doc_id, text, {_TOK} AS tok,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
               AS n_punct
      FROM documents
    ),
    q AS (
      SELECT doc_id,
             CAST(len(tok) AS INT) AS n_tokens,
             round(0.4 * least(1.0, CAST(len(tok) AS DOUBLE) / 100.0)
                   + 0.3 * (1.0 - CAST(n_punct AS DOUBLE) / n_chars)
                   + 0.3 * least(1.0, 5.0 *
                       (CAST(len(list_filter(tok, t ->
                          list_contains({stop_list}, t))) AS DOUBLE) / len(tok))),
                   6) AS quality_score
      FROM q0 WHERE len(tok) > 0
    ),
    ex AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS ex_canon
      FROM documents
    ),
    d5 AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len({_TOK}) - 4, 0)),
               i -> array_to_string(({_TOK})[i:i+4], ' '))) AS sh
      FROM documents
    ),
    docs5 AS (SELECT doc_id, sh, len(sh) AS n_sh FROM d5 WHERE len(sh) > 0),
    inv AS (SELECT doc_id, unnest(sh) AS shingle FROM docs5),
    cnt AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT p.a_id, p.b_id
      FROM cnt p
      JOIN docs5 sa ON sa.doc_id = p.a_id
      JOIN docs5 sb ON sb.doc_id = p.b_id
      WHERE round(p.common / (sa.n_sh + sb.n_sh - p.common), 6) >= 0.1
    ),
    canon AS (
      SELECT d.doc_id, coalesce(min(p.a_id), d.doc_id) AS canonical_id
      FROM documents d LEFT JOIN pairs p ON p.b_id = d.doc_id
      GROUP BY d.doc_id
    ),
    flags AS (
      SELECT d.doc_id,
             coalesce(q.n_tokens BETWEEN 10 AND 1000, FALSE) AS pass_tok,
             coalesce(q.quality_score >= 0.5, FALSE) AS pass_q,
             (ex.ex_canon = d.doc_id) AS pass_ex,
             (c.canonical_id = d.doc_id) AS pass_near
      FROM documents d
      LEFT JOIN q ON q.doc_id = d.doc_id
      JOIN ex ON ex.doc_id = d.doc_id
      JOIN canon c ON c.doc_id = d.doc_id
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN pass_tok THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(sum(CASE WHEN pass_tok AND pass_q THEN 1 ELSE 0 END)
                  AS BIGINT) AS s3,
             CAST(sum(CASE WHEN pass_tok AND pass_q AND pass_ex THEN 1 ELSE 0
                  END) AS BIGINT) AS s4,
             CAST(sum(CASE WHEN pass_tok AND pass_q AND pass_ex AND pass_near
                  THEN 1 ELSE 0 END) AS BIGINT) AS s5
      FROM flags
    )
    SELECT stage, n_docs FROM (
      SELECT '1_total' AS stage, s1 AS n_docs FROM agg
      UNION ALL SELECT '2_token_filter', s2 FROM agg
      UNION ALL SELECT '3_quality_filter', s3 FROM agg
      UNION ALL SELECT '4_exact_dedup', s4 FROM agg
      UNION ALL SELECT '5_near_dedup', s5 FROM agg
    ) ORDER BY stage
    """


@register("docs_curation_funnel", oracle=_funnel_oracle())
def docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    quality = text_analysis.quality_score(docs, "doc_id", "text").select(
        "doc_id", "n_tokens", "quality_score"
    )
    ex_w = Window.partitionBy(F.md5("text"))
    ex = docs.select(
        "doc_id", F.min("doc_id").over(ex_w).alias("ex_canon")
    )
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k_shingle=5, threshold=0.1)
    canon = dedup.canonical_ids(docs, pairs, "doc_id").select(
        "doc_id", "canonical_id"
    )
    flags = (
        docs.select("doc_id")
        .join(quality, "doc_id", "left")
        .join(ex, "doc_id")
        .join(canon, "doc_id")
        .select(
            F.coalesce(
                F.col("n_tokens").between(10, 1000), F.lit(False)
            ).alias("pass_tok"),
            F.coalesce(F.col("quality_score") >= 0.5, F.lit(False)).alias(
                "pass_q"
            ),
            (F.col("ex_canon") == F.col("doc_id")).alias("pass_ex"),
            (F.col("canonical_id") == F.col("doc_id")).alias("pass_near"),
        )
    )
    cnt = F.count("*")

    def _surv(*conds) -> F.Column:
        keep = conds[0]
        for c in conds[1:]:
            keep = keep & c
        return F.sum(F.when(keep, 1).otherwise(0)).cast("bigint")

    tok, q, ex_f, near = (
        F.col("pass_tok"),
        F.col("pass_q"),
        F.col("pass_ex"),
        F.col("pass_near"),
    )
    agg = flags.agg(
        cnt.cast("bigint").alias("s1"),
        _surv(tok).alias("s2"),
        _surv(tok, q).alias("s3"),
        _surv(tok, q, ex_f).alias("s4"),
        _surv(tok, q, ex_f, near).alias("s5"),
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(stage).alias("stage"), F.col(col).alias("n_docs")
                    )
                    for stage, col in [
                        ("1_total", "s1"),
                        ("2_token_filter", "s2"),
                        ("3_quality_filter", "s3"),
                        ("4_exact_dedup", "s4"),
                        ("5_near_dedup", "s5"),
                    ]
                ]
            )
        ).alias("x")
    ).select("x.stage", "x.n_docs").orderBy("stage")


# ---------------------------------------------------------------------------
# docs_lm_perplexity — add-k bigram LM estimated on the corpus itself;
# per-doc perplexity (LM-based quality filter).
# ---------------------------------------------------------------------------
_LM_K = 0.5


@register(
    "docs_lm_perplexity",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOK} AS tok FROM documents
      WHERE len({_TOK}) >= 2
    ),
    pairs AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(tok) - 1),
                                   i -> tok[i])) AS w1,
             unnest(list_transform(generate_series(1, len(tok) - 1),
                                   i -> tok[i + 1])) AS w2
      FROM base
    ),
    bg AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c12) AS c1 FROM bg GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT w1 AS t FROM bg UNION SELECT w2 FROM bg)
    )
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-ln((bg.c12 + {_LM_K}) / (c1.c1 + {_LM_K} * vocab.v))), 6)
             AS avg_nll,
           round(exp(avg(-ln((bg.c12 + {_LM_K}) / (c1.c1 + {_LM_K} * vocab.v)))), 4)
             AS perplexity
    FROM pairs p
    JOIN bg USING (w1, w2)
    JOIN c1 USING (w1)
    CROSS JOIN vocab
    GROUP BY p.doc_id
    """,
)
def docs_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ranking.bigram_lm_scores(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k_smooth=_LM_K
    )


# ---------------------------------------------------------------------------
# docs_source_cap — anti-domination: each source contributes at most N
# docs, chosen by deterministic hash rank (reproducible on any cluster).
# ---------------------------------------------------------------------------
_CAP = 100


@register(
    "docs_source_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY (('0x' || substr(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT) ASC,
                        doc_id ASC
             ) AS INT) AS group_rank
      FROM documents
    )
    SELECT doc_id, source, group_rank FROM ranked WHERE group_rank <= {_CAP}
    """,
)
def docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(docs, "doc_id", "source", cap=_CAP).select(
        "doc_id", "source", "group_rank"
    )


# ---------------------------------------------------------------------------
# docs_hybrid_rrf — hybrid retrieval: BM25 lexical top-50 fused with
# cosine vector top-50 (query vec 0) by Reciprocal Rank Fusion
# (score = sum 1/(60+rank)); the standard two-tower retrieval merge.
# documents.doc_id and embeddings.vec_id are the same id space.
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_DEPTH = 50
_RRF_DIM = 64


@register(
    "docs_hybrid_rrf",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (
      SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS dl
      FROM t WHERE len(tok) > 0
    ),
    corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM b),
    post AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(tok) AS term FROM b)
      WHERE term IN ({", ".join(f"'{w}'" for w in _BM25_TERMS)})
      GROUP BY 1, 2
    ),
    tdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
    bscored AS (
      SELECT p.doc_id,
             round(sum(
               ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
               * ((p.tf * ({_K1} + 1)) /
                  (p.tf + {_K1} * ((1.0 - {_B}) + (({_B} * b2.dl) / avgdl))))
             ), 6) AS score
      FROM post p JOIN tdf USING (term) JOIN b b2 USING (doc_id)
      CROSS JOIN corpus GROUP BY p.doc_id
    ),
    lex AS (
      SELECT doc_id, CAST(rank AS INT) AS lex_rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM bscored
      ) WHERE rank <= {_RRF_DEPTH}
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cscored AS (
      SELECT e.vec_id AS doc_id,
             round(
               list_sum(list_transform(generate_series(1, {_RRF_DIM}),
                        i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(generate_series(1, {_RRF_DIM}),
                        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
                  * sqrt(list_sum(list_transform(generate_series(1, {_RRF_DIM}),
                        i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)))), 6) AS cosine
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    ),
    vec AS (
      SELECT doc_id, CAST(rank AS INT) AS vec_rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank
        FROM cscored
      ) WHERE rank <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
             round(coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0)
                 + coalesce(1.0 / ({_RRF_K} + v.vec_rank), 0), 6) AS rrf
      FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank, rrf, rank FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
      FROM fused
    ) WHERE rank <= 20
    """,
)
def docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = ranking.bm25_scores(
        docs, "doc_id", "text", _BM25_TERMS, k1=_K1, b=_B, top_n=_RRF_DEPTH
    ).select("doc_id", F.col("rank").alias("lex_rank"))
    vec = similarity.cosine_topk(
        emb, "vec_id", "embedding", [0], k=_RRF_DEPTH
    ).select(F.col("vec_id").alias("doc_id"), F.col("rank").alias("vec_rank"))
    rrf = F.round(
        F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0)),
        6,
    )
    # union + groupBy instead of a FULL OUTER join: doc_id is unique
    # within each side, so max() folds the at-most-two rows per doc into
    # exactly the outer join's (lex_rank, vec_rank) row — one small
    # exchange replaces the two sort exchanges + SortMergeJoin the
    # planner produced for the ≤2·depth-row fusion (guide §2.4).
    both = lex.withColumn("vec_rank", F.lit(None).cast("int")).unionByName(
        vec.withColumn("lex_rank", F.lit(None).cast("int"))
    )
    fused = (
        both.groupBy("doc_id")
        .agg(
            F.max("lex_rank").alias("lex_rank"),
            F.max("vec_rank").alias("vec_rank"),
        )
        .select("doc_id", "lex_rank", "vec_rank", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(20)
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return fused.withColumn("rank", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# token_countmin_topk — Count-Min sketch heavy hitters: the exact top-20
# tokens with their sketch estimate and overestimate (estimate >= exact
# always; d=4, w=1024).  The fixed-memory mergeable sketch every
# streaming/distributed frequency pipeline uses.
# ---------------------------------------------------------------------------
_CM_D, _CM_W = 4, 1024


@register(
    "token_countmin_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOK}) AS token FROM documents
    ),
    counters AS (
      SELECT t.i AS depth,
             CAST((('0x' || substr(md5('cm' || CAST(t.i AS VARCHAR) || ':' || token), 1, 7))::BIGINT) % {_CM_W} AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM tok CROSS JOIN generate_series(0, {_CM_D - 1}) t(i)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS exact_n
      FROM tok GROUP BY 1
      ORDER BY exact_n DESC, token LIMIT 20
    )
    SELECT e.token, e.exact_n, min(c.c) AS cm_estimate,
           CAST(min(c.c) - e.exact_n AS BIGINT) AS overestimate
    FROM exact e
    CROSS JOIN generate_series(0, {_CM_D - 1}) t(i)
    JOIN counters c
      ON c.depth = t.i
     AND c.bucket = CAST((('0x' || substr(md5('cm' || CAST(t.i AS VARCHAR) || ':' || e.token), 1, 7))::BIGINT) % {_CM_W} AS INT)
    GROUP BY e.token, e.exact_n
    """,
)
def token_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int28
    from ..functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    counters = text_analysis.countmin_counters(docs, "text", _CM_D, _CM_W)
    tok = docs.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
    exact = (
        tok.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "token")
        .limit(20)
    )
    probes = exact.select(
        "token",
        "exact_n",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_CM_D - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("depth"),
                    F.pmod(
                        md5_int28(
                            F.concat(
                                F.lit("cm"), i.cast("string"), F.lit(":"), F.col("token")
                            )
                        ),
                        F.lit(_CM_W),
                    ).cast("int").alias("bucket"),
                ),
            )
        ).alias("p"),
    ).select("token", "exact_n", "p.depth", "p.bucket")
    return (
        probes.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy("token", "exact_n")
        .agg(
            F.min("c").alias("cm_estimate"),
            (F.min("c") - F.col("exact_n")).cast("bigint").alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# docs_passage_dedup — sub-document exact dedup (the RefinedWeb/Falcon
# passage trick): repeated 16-token passages survive only at their
# first corpus occurrence; per-doc attrition stats.  One passage-hash
# shuffle + a reused-exchange join + one doc aggregate
# (operators/dedup.py:passage_dedup_stats).
# ---------------------------------------------------------------------------
_PASSAGE = 16


@register(
    "docs_passage_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (SELECT doc_id, tok, len(tok) AS n FROM t WHERE len(tok) > 0),
    e AS (
      SELECT doc_id, tok,
             unnest(generate_series(0, CAST(ceil(n / {_PASSAGE}.0) AS BIGINT) - 1))
               AS i
      FROM b
    ),
    p AS (
      SELECT doc_id, i,
             array_to_string(tok[(i*{_PASSAGE}+1):(i*{_PASSAGE}+{_PASSAGE})], ' ')
               AS passage
      FROM e
    ),
    firsts AS (
      SELECT passage, min(doc_id * 1000000 + i) AS fk FROM p GROUP BY 1
    )
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN p.doc_id * 1000000 + p.i = f.fk THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(count(*) - sum(CASE WHEN p.doc_id * 1000000 + p.i = f.fk
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           round((count(*) - sum(CASE WHEN p.doc_id * 1000000 + p.i = f.fk
                                      THEN 1 ELSE 0 END)) / count(*), 6)
             AS drop_frac
    FROM p JOIN firsts f USING (passage)
    GROUP BY 1
    """,
)
def docs_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.passage_dedup_stats(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        passage_tokens=_PASSAGE,
    )


# ---------------------------------------------------------------------------
# docs_passage_dedup_incremental — the daily-crawl path for the passage
# tier: docs with doc_id % 5 = 0 play the new batch, the rest the
# historical corpus reduced to its STORED passage-hash index
# (operators/dedup.py:passage_hash_index).  Temporal-first: a passage
# already in the index drops everywhere in the batch (history kept its
# copy at ingest); a corpus-new passage keeps its batch-first
# occurrence.  History is never re-enumerated — O(batch) on the batch
# side, completing the incremental story across all four dedup
# granularities (exact whole-doc, LSH near-dup, spans, passages).
# ---------------------------------------------------------------------------
@register(
    "docs_passage_dedup_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (SELECT doc_id, tok, len(tok) AS n FROM t WHERE len(tok) > 0),
    e AS (
      SELECT doc_id, tok,
             unnest(generate_series(0, CAST(ceil(n / {_PASSAGE}.0) AS BIGINT) - 1))
               AS i
      FROM b
    ),
    p AS (
      SELECT doc_id, i,
             array_to_string(tok[(i*{_PASSAGE}+1):(i*{_PASSAGE}+{_PASSAGE})], ' ')
               AS passage
      FROM e
    ),
    hist AS (SELECT DISTINCT passage FROM p WHERE doc_id % 5 <> 0),
    bp AS (SELECT doc_id, i, passage FROM p WHERE doc_id % 5 = 0),
    firsts AS (
      SELECT passage, min(doc_id * 1000000 + i) AS fk FROM bp GROUP BY 1
    )
    SELECT bp.doc_id,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN bp.doc_id * 1000000 + bp.i = f.fk
                          AND h.passage IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(count(*) - sum(CASE WHEN bp.doc_id * 1000000 + bp.i = f.fk
                                     AND h.passage IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           round((count(*) - sum(CASE WHEN bp.doc_id * 1000000 + bp.i = f.fk
                                       AND h.passage IS NULL THEN 1 ELSE 0 END))
                 / count(*), 6) AS drop_frac
    FROM bp
    JOIN firsts f USING (passage)
    LEFT JOIN hist h USING (passage)
    GROUP BY 1
    """,
)
def docs_passage_dedup_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    # In production the index side is the STORED (hash, count) table
    # persisted at ingest, not a re-enumeration of the corpus.
    index = dedup.passage_hash_index(
        docs.filter(~is_new), "text", passage_tokens=_PASSAGE
    )
    return dedup.passage_dedup_incremental(
        docs.filter(is_new), index, "doc_id", "text", passage_tokens=_PASSAGE
    )


# ---------------------------------------------------------------------------
# docs_dsir_weights — DSIR importance weighting (Xie et al. 2023,
# arXiv:2302.03169): hashed unigram+bigram features, add-1-smoothed
# target (lang='en') vs source (all docs) bucket distributions,
# per-doc log importance weight.  Integerized micro log-ratios make
# the per-doc sum exact-integer (association-order-proof); one corpus
# shuffle end-to-end (operators/importance.py).
# ---------------------------------------------------------------------------
_DSIR_B = 256


@register(
    "docs_dsir_weights",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOK} AS tok FROM documents),
    u AS (SELECT doc_id, lang, unnest(tok) AS f FROM t),
    bp AS (
      SELECT doc_id, lang, tok,
             unnest(generate_series(0, len(tok) - 2)) AS i
      FROM t WHERE len(tok) >= 2
    ),
    bi AS (SELECT doc_id, lang, tok[i+1] || ' ' || tok[i+2] AS f FROM bp),
    feats AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(f), 1, 7))::BIGINT) % {_DSIR_B} AS b
      FROM (SELECT * FROM u UNION ALL SELECT * FROM bi)
    ),
    buckets AS (
      SELECT b,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc,
             count(*) AS sc
      FROM feats GROUP BY 1
    ),
    totals AS (SELECT sum(tc) AS tt, sum(sc) AS st FROM buckets),
    ratios AS (
      SELECT b,
             CAST(round(1e6 * ln(
               (CAST(tc + 1 AS DOUBLE) * CAST(st + {_DSIR_B} AS DOUBLE))
               / (CAST(sc + 1 AS DOUBLE) * CAST(tt + {_DSIR_B} AS DOUBLE))
             )) AS BIGINT) AS L
      FROM buckets, totals
    )
    SELECT f.doc_id,
           CAST(count(*) AS BIGINT) AS n_feats,
           CAST(sum(r.L) AS BIGINT) AS log_weight_micro,
           round(CAST(sum(r.L) AS BIGINT) / 1e6, 6) AS log_weight
    FROM feats f JOIN ratios r USING (b)
    GROUP BY 1
    """,
)
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance

    return importance.dsir_log_weights(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        target_filter="lang = 'en'",
        n_buckets=_DSIR_B,
    )


# ---------------------------------------------------------------------------
# docs_curriculum_buckets — perplexity curriculum: decile assignment
# over the bigram-LM avg NLL via the DISTRIBUTED exact ntile (sampled
# range buckets + prefix sums — no single-partition global window),
# the standard easy→hard data-ordering signal for curriculum training.
# ---------------------------------------------------------------------------
@register(
    "docs_curriculum_buckets",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOK} AS tok FROM documents
      WHERE len({_TOK}) >= 2
    ),
    pairs AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(tok) - 1),
                                   i -> tok[i])) AS w1,
             unnest(list_transform(generate_series(1, len(tok) - 1),
                                   i -> tok[i + 1])) AS w2
      FROM base
    ),
    bg AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c12) AS c1 FROM bg GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT w1 AS t FROM bg UNION SELECT w2 FROM bg)
    ),
    nll AS (
      SELECT p.doc_id,
             round(avg(-ln((bg.c12 + {_LM_K}) / (c1.c1 + {_LM_K} * vocab.v))), 6)
               AS avg_nll
      FROM pairs p
      JOIN bg USING (w1, w2)
      JOIN c1 USING (w1)
      CROSS JOIN vocab
      GROUP BY p.doc_id
    )
    SELECT doc_id, avg_nll,
           CAST(ntile(10) OVER (ORDER BY avg_nll, doc_id) AS INT) AS bucket
    FROM nll
    """,
)
def docs_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.distributed_rank import exact_ntile

    nll = ranking.bigram_lm_scores(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k_smooth=_LM_K
    ).select("doc_id", "avg_nll")
    # Materialize the per-doc score table ONCE: exact_ntile issues a
    # count job before its windowed pass, which would otherwise re-run
    # the whole bigram-LM pipeline (same persist-the-narrow-dimension
    # pattern as customer_rfm; A/B at sf0.1: 2.43 s -> 1.79 s).  The
    # checkpointed table is one narrow row per doc — tiny next to the
    # corpus at any scale.
    nll = nll.localCheckpoint(eager=True)
    return exact_ntile(nll, 10, ["avg_nll", "doc_id"], tile_col="bucket")


# ---------------------------------------------------------------------------
# docs_bpe_fertility — BPE tokenizer induction end-to-end (Sennrich et
# al. 2016): learn the top-60 merges from the corpus's word-type
# frequencies (one corpus shuffle + driver loop on the type dict),
# then segment every document Arrow-batched and report fertility (BPE
# tokens per word — the tokenizer-quality metric).  This entry stays
# rows-only because unrolling ITS 60-merge config in SQL is past the
# oracle's planning-cost sweet spot — but the same train+segment path
# IS value-hash-gated at the 8-merge config by docs_bpe_train_merges
# (training) and docs_bpe_encode (per-doc token streams, r10 build
# session), and determinism is pinned by unit tests against the
# reference algorithm's known merge sequence.
# SELF-CHECKING (r7 verdict #4): the merge table must respect the
# requested budget and min-frequency (raises at construction), and
# every row must satisfy the structural fertility bounds — at least
# one BPE token per word (fertility >= 1), and at most len(word)+1
# symbols per word, witnessed per doc as n_bpe_tokens <= n_chars +
# n_words — all asserted in-plan, so the rows-only driver row
# certifies segmentation semantics from both sides.
# ---------------------------------------------------------------------------
@register("docs_bpe_fertility")
def docs_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe

    n_merges, min_freq = 60, 2
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, "text", n_merges=n_merges, min_freq=min_freq)
    if len(merges) > n_merges:
        raise AssertionError(
            f"learned {len(merges)} merges > budget {n_merges}"
        )
    if any(f < min_freq for _l, _r, f in merges):
        raise AssertionError("a learned merge fell below min_freq")
    seg = bpe.bpe_segment_docs(docs, "doc_id", "text", merges).join(
        # upper-bound witness: each word of length L segments into at
        # most L+1 symbols (chars + end-of-word marker), and word chars
        # are a subset of the doc's chars, so n_bpe_tokens can never
        # exceed n_chars + n_words
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    row_ok = (
        (F.col("n_words") >= 1)
        & (F.col("n_bpe_tokens") >= F.col("n_words"))
        & (F.col("n_bpe_tokens") <= F.col("n_chars") + F.col("n_words"))
        & (F.col("fertility") >= 1.0)
    )
    return seg.select(
        "doc_id",
        "n_words",
        F.coalesce(
            F.assert_true(
                row_ok, F.lit("BPE fertility bounds violated")
            ),
            F.col("n_bpe_tokens"),
        ).alias("n_bpe_tokens"),
        "fertility",
        F.lit(len(merges)).cast("int").alias("n_merges_learned"),
    )


# ---------------------------------------------------------------------------
# docs_bpe_train_merges — BPE merge TRAINING under the cross-engine
# value hash (the tokenizer-path analog of embedding_semdedup_trained's
# k-means gate): the learned merge table itself is the query result,
# and the DuckDB oracle unrolls the same greedy merge loop in SQL, so
# the training job — not just its downstream application — is
# hash-gated.  The SEGMENTATION side is gated too since the r10 build
# session — docs_bpe_encode joins doc positions to the chain's final
# state{n} — at this entry's 8-merge config; only the 60-merge
# fertility variant stays rows-only (unrolling 60 iterations is where
# the SQL oracle stops being worth its planning cost).
#
# Determinism contract shared by both engines (operators/bpe.py):
# (freq desc, word) type cap; per-iteration best pair by
# (pair_freq desc, lhs, rhs) — binary collation both sides; merges
# applied LEFT-TO-RIGHT non-overlapping.  The oracle models
# left-to-right with a run-parity window: positions i and i+1 can both
# be candidates only when lhs = rhs = the run's symbol (s_i=lhs,
# s_{i+1}=rhs=lhs forces equality), so within each maximal candidate
# run the merged positions are exactly the even offsets from the run
# start — no recursion needed.  State CTEs are MATERIALIZED: each is
# referenced twice (pair counting + application) and inlining doubles
# the chain per iteration — 2^8 blowup without it.
#
# Scale shape (the split every production BPE trainer uses): the ONE
# corpus-sized pass is the word-type frequency aggregate; the cap to
# max_types is a TakeOrdered (bounded driver memory); the 8-iteration
# merge loop runs driver-side on the type dict, cost O(n_merges *
# types) independent of corpus size.  min_freq=2 is enforced
# Spark-side but not modeled in the unrolled SQL — the fixtures'
# 8th-best pair frequency is ~2.7k at sf0.001 (~27k at sf0.1), three
# orders of magnitude above the floor.
# ---------------------------------------------------------------------------
_BPE_T, _BPE_M = 20_000, 8


def _bpe_chain(max_types: int, n_merges: int) -> list[str]:
    """The shared unrolled-merge CTE chain (see the contract comment
    above ``docs_bpe_train_merges``): ``types`` caps the word-type
    table, ``state{k}`` is every word's segmentation after merges
    1..k.  Both the training oracle (which reads ``best{k}``) and the
    encode oracle (which reads the final ``state{n}``) build on the
    SAME generated text, so the two gates can never drift apart."""
    parts = [
        f"""
    tok AS MATERIALIZED (SELECT unnest({_TOK}) AS w FROM documents),
    types AS MATERIALIZED (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM tok GROUP BY w ORDER BY freq DESC, word LIMIT {max_types}
    ),
    state0 AS MATERIALIZED (
      SELECT word, freq,
             list_append(regexp_extract_all(word, '.'), '</w>') AS syms
      FROM types
    )"""
    ]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(f"""
    pairs{k} AS MATERIALIZED (
      SELECT syms[i] AS lhs, syms[i+1] AS rhs, sum(freq) AS f
      FROM state{p}, unnest(generate_series(1, len(syms)-1)) AS u(i)
      GROUP BY 1, 2
    ),
    best{k} AS MATERIALIZED (
      SELECT lhs, rhs, f FROM pairs{k} ORDER BY f DESC, lhs, rhs LIMIT 1
    ),
    pos{k} AS (
      SELECT s.word, s.freq, s.syms[u.i] AS sym, u.i AS i,
             coalesce(s.syms[u.i] = b.lhs AND s.syms[u.i+1] = b.rhs,
                      FALSE) AS p
      FROM state{p} s CROSS JOIN best{k} b,
           unnest(generate_series(1, len(s.syms))) AS u(i)
    ),
    runs{k} AS (
      SELECT word, freq, i, p, sym,
             CASE WHEN p THEN i - row_number() OVER (
               PARTITION BY word, p ORDER BY i) END AS grp
      FROM pos{k}
    ),
    mark{k} AS (
      SELECT word, freq, i, sym,
             p AND ((i - min(i) OVER (PARTITION BY word, grp)) % 2 = 0)
               AS m
      FROM runs{k}
    ),
    emit{k} AS (
      SELECT word, freq, i, sym, m,
             lag(m, 1, FALSE) OVER (PARTITION BY word ORDER BY i)
               AS prev_m
      FROM mark{k}
    ),
    state{k} AS MATERIALIZED (
      SELECT emit{k}.word, emit{k}.freq,
             list(CASE WHEN m THEN b.lhs || b.rhs ELSE sym END ORDER BY i)
               FILTER (WHERE m OR NOT prev_m) AS syms
      FROM emit{k} CROSS JOIN best{k} b
      GROUP BY emit{k}.word, emit{k}.freq
    )""")
    return parts


def _bpe_train_oracle(max_types: int, n_merges: int) -> str:
    union = " UNION ALL ".join(
        f"SELECT {k} AS rank, lhs, rhs, CAST(f AS BIGINT) AS pair_freq "
        f"FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",".join(_bpe_chain(max_types, n_merges)) + "\n    " + union
    )


def _bpe_encode_oracle(max_types: int, n_merges: int) -> str:
    tail = f"""
    tokd AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    pos AS (
      SELECT t.doc_id, u.i, t.tok[u.i] AS w
      FROM tokd t, unnest(generate_series(1, len(t.tok))) AS u(i)
    ),
    enc AS (
      SELECT p.doc_id, p.i, s.syms
      FROM pos p JOIN state{n_merges} s ON p.w = s.word
    )"""
    return (
        "WITH "
        + ",".join(_bpe_chain(max_types, n_merges) + [tail])
        + """
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(syms)) AS BIGINT) AS n_bpe_tokens,
           md5(string_agg(array_to_string(syms, ' '), ' ' ORDER BY i))
             AS token_hash
    FROM enc GROUP BY doc_id"""
    )


@register(
    "docs_bpe_train_merges", oracle=_bpe_train_oracle(_BPE_T, _BPE_M)
)
def docs_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(
        docs, "text", n_merges=_BPE_M, min_freq=2, max_types=_BPE_T
    )
    rows = [
        (k + 1, lhs, rhs, int(f)) for k, (lhs, rhs, f) in enumerate(merges)
    ]
    # the merge table is the training artifact: k rows, driver-bounded
    # by construction (the loop already ran on the collected type dict)
    return spark.createDataFrame(
        rows, "rank int, lhs string, rhs string, pair_freq bigint"
    )


# ---------------------------------------------------------------------------
# docs_bpe_encode — BPE ENCODING under the cross-engine value hash:
# the Arrow-batched segmentation leg (operators/bpe.py:
# bpe_encode_docs, best-rank-first inference with a per-batch word
# memo) produces each document's full token stream, and the gate
# reduces it to (n_words, n_bpe_tokens, md5 of the space-joined
# stream) — so token IDENTITY and ORDER are hashed, not just counts.
# The DuckDB oracle reuses the training chain's final state{n} (every
# capped word type's segmentation after replaying merges 1..n in
# training order) and joins it to per-doc token positions; the
# equivalence of best-rank-first inference to training-order replay is
# the standard BPE property (Sennrich et al. 2016) and this gate is
# what pins it cross-engine.  With docs_bpe_train_merges (training)
# this closes the BPE loop: only the 60-merge fertility variant stays
# rows-only (unrolling 60 iterations in SQL is where the oracle stops
# being worth its planning cost).
#
# Vocabulary-cap caveat, by design LOUD: the oracle's inner join drops
# any doc word outside the capped type table while the Spark side
# still segments it, so a corpus whose vocabulary ever exceeded
# max_types (fixtures: 31 words vs 20k cap) fails the hash gate
# instead of silently passing.
#
# Scale shape: training as in docs_bpe_train_merges (one type
# aggregate + driver loop); encoding is map-only mapInPandas — zero
# shuffles at any corpus size; the gate's md5 is computed JVM-side.
# ---------------------------------------------------------------------------
@register(
    "docs_bpe_encode", oracle=_bpe_encode_oracle(_BPE_T, _BPE_M)
)
def docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(
        docs, "text", n_merges=_BPE_M, min_freq=2, max_types=_BPE_T
    )
    enc = bpe.bpe_encode_docs(docs, "doc_id", "text", merges)
    return enc.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.md5(F.concat_ws(" ", F.col("bpe_tokens"))).alias("token_hash"),
    )


# ---------------------------------------------------------------------------
# docs_quality_classifier — fastText-style linear quality classifier
# inference (the CCNet / LLaMA wiki-ref filter shape): hashed
# unigram+bigram features x frozen MD5-derived micro-weights, integer
# logit sum, sigmoid score, keep flag.  Map-only — zero shuffles at
# any corpus size (operators/text_analysis.py:quality_classifier).
# ---------------------------------------------------------------------------
_QC_B = 256


@register(
    "docs_quality_classifier",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    u AS (SELECT doc_id, unnest(tok) AS f FROM t),
    bp AS (
      SELECT doc_id, tok, unnest(generate_series(0, len(tok) - 2)) AS i
      FROM t WHERE len(tok) >= 2
    ),
    bi AS (SELECT doc_id, tok[i+1] || ' ' || tok[i+2] AS f FROM bp),
    feats AS (
      SELECT doc_id,
             (('0x' || substr(md5(f), 1, 7))::BIGINT) % {_QC_B} AS b
      FROM (SELECT doc_id, f FROM u UNION ALL SELECT doc_id, f FROM bi)
    ),
    scored AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum(
               (('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 7))::BIGINT)
                 % 2000001 - 1000000
             ) AS BIGINT) AS logit_micro
      FROM feats GROUP BY 1
    )
    SELECT doc_id, n_feats, logit_micro,
           round(1.0 / (1.0 + exp(-(logit_micro / (n_feats * 1000000.0)))), 6)
             AS quality_score,
           round(1.0 / (1.0 + exp(-(logit_micro / (n_feats * 1000000.0)))), 6)
             >= 0.5 AS keep
    FROM scored
    """,
)
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.quality_classifier(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n_buckets=_QC_B, threshold=0.5,
    )


# ---------------------------------------------------------------------------
# docs_quality_train_weights — TRAIN the classifier's weight table
# (one-pass Naive-Bayes log-odds over hashed n-gram features, positives
# = lang='en'): per-bucket integerized micro log-odds, the exact table
# quality_classifier(weights=...) consumes.  One explode + one
# bucket-keyed aggregate (<= 256 output rows at any corpus size) + a
# broadcast totals scalar (operators/text_analysis.py:
# train_quality_weights).
# ---------------------------------------------------------------------------
_QT_FEATS = f"""
    WITH t AS (SELECT doc_id, lang = 'en' AS pos, {_TOK} AS tok FROM documents),
    u AS (SELECT doc_id, pos, unnest(tok) AS f FROM t),
    bp AS (
      SELECT doc_id, pos, tok, unnest(generate_series(0, len(tok) - 2)) AS i
      FROM t WHERE len(tok) >= 2
    ),
    bi AS (SELECT doc_id, pos, tok[i+1] || ' ' || tok[i+2] AS f FROM bp),
    feats AS (
      SELECT doc_id, pos,
             (('0x' || substr(md5(f), 1, 7))::BIGINT) % {_QC_B} AS b
      FROM (SELECT doc_id, pos, f FROM u
            UNION ALL SELECT doc_id, pos, f FROM bi)
    ),
    buckets AS (
      SELECT b,
             sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pc,
             count(*) - sum(CASE WHEN pos THEN 1 ELSE 0 END) AS nc
      FROM feats GROUP BY 1
    ),
    totals AS (SELECT sum(pc) AS pt, sum(nc) AS nt FROM buckets),
    wtab AS (
      SELECT b,
             CAST(round(1e6 * ln(
               (CAST(pc + 1 AS DOUBLE) * CAST(nt + {_QC_B} AS DOUBLE))
               / (CAST(nc + 1 AS DOUBLE) * CAST(pt + {_QC_B} AS DOUBLE))
             )) AS BIGINT) AS w,
             pc, nc
      FROM buckets, totals
    )
"""


@register(
    "docs_quality_train_weights",
    oracle=_QT_FEATS
    + """
    SELECT CAST(b AS INT) AS bucket, w AS w_micro,
           CAST(pc AS BIGINT) AS pos_count, CAST(nc AS BIGINT) AS neg_count
    FROM wtab
    """,
)
def docs_quality_train_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.train_quality_weights(
        load_table(spark, sf_dir, "documents"), "text",
        label_filter="lang = 'en'", n_buckets=_QC_B,
    )


# ---------------------------------------------------------------------------
# docs_quality_classifier_trained — the full train->infer loop as ONE
# oracle-gated query: train the log-odds weight table, then run the
# classifier's collect-to-literal trained-weights path with it (the
# bounded 256-row collect at plan construction).  Scores now separate
# lang='en'-like docs instead of the frozen pseudo-random stand-in.
# ---------------------------------------------------------------------------
@register(
    "docs_quality_classifier_trained",
    oracle=_QT_FEATS
    + """
    , scored AS (
      SELECT f.doc_id,
             CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum(w.w) AS BIGINT) AS logit_micro
      FROM feats f JOIN wtab w USING (b)
      GROUP BY 1
    )
    SELECT doc_id, n_feats, logit_micro,
           round(1.0 / (1.0 + exp(-(logit_micro / (n_feats * 1000000.0)))), 6)
             AS quality_score,
           round(1.0 / (1.0 + exp(-(logit_micro / (n_feats * 1000000.0)))), 6)
             >= 0.5 AS keep
    FROM scored
    """,
)
def docs_quality_classifier_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wtab = text_analysis.train_quality_weights(
        docs, "text", label_filter="lang = 'en'", n_buckets=_QC_B
    )
    return text_analysis.quality_classifier(
        docs, "doc_id", "text", n_buckets=_QC_B, threshold=0.5, weights=wtab
    )


# ---------------------------------------------------------------------------
# docs_quality_auc_eval — the EVAL leg of the quality tier, completing
# its train → infer → evaluate loop the way the recall evals complete
# dedup/ANN's: Mann-Whitney AUC of the TRAINED classifier's scores
# against the same labels it trained on (lang='en'; resubstitution AUC
# — the sanity diagnostic that the learned weights actually separate
# the classes, watched exactly like the recall metrics in the monitor
# policy).  Scale shape (operators/text_analysis.py:classifier_auc):
# the corpus reduces to a (score, pos, neg) histogram — bounded by the
# number of distinct 6dp scores — and the rank-sum runs over THAT, in
# integer arithmetic until the final division, so the result is
# aggregation-order-invariant and the DuckDB oracle matches
# bit-for-bit.  Ties use standard mid-ranks; AUC is NULL (not 0) if a
# class is empty.
# ---------------------------------------------------------------------------
@register(
    "docs_quality_auc_eval",
    oracle=_QT_FEATS
    + """
    , scored AS (
      SELECT f.doc_id,
             CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum(w.w) AS BIGINT) AS logit_micro
      FROM feats f JOIN wtab w USING (b)
      GROUP BY 1
    ),
    lab AS (
      SELECT round(1.0 / (1.0 + exp(-(s.logit_micro /
                 (s.n_feats * 1000000.0)))), 6) AS score,
             d.lang = 'en' AS pos
      FROM scored s JOIN documents d USING (doc_id)
    ),
    hist AS (
      -- NULL labels are excluded, not negatives (unlabeled != labeled
      -- negative); mirrors classifier_auc's isNotNull filter
      SELECT score,
             sum(CASE WHEN pos THEN 1 ELSE 0 END) AS p,
             sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n
      FROM lab WHERE pos IS NOT NULL GROUP BY score
    ),
    r AS (
      SELECT p, n,
             coalesce(sum(n) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumn
      FROM hist
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(n) AS BIGINT) AS n_neg,
           CASE WHEN sum(p) > 0 AND sum(n) > 0 THEN
             round(sum(p * (2 * cumn + n)) /
                   (2.0 * sum(p) * sum(n)), 6)
           END AS auc
    FROM r
    """,
)
def docs_quality_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wtab = text_analysis.train_quality_weights(
        docs, "text", label_filter="lang = 'en'", n_buckets=_QC_B
    )
    scored = text_analysis.quality_classifier(
        docs, "doc_id", "text", n_buckets=_QC_B, threshold=0.5, weights=wtab
    )
    lab = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").alias("pos")),
        "doc_id",
    )
    return text_analysis.classifier_auc(
        lab, "pos", score_col="quality_score"
    )


# ---------------------------------------------------------------------------
# docs_duplicated_spans / docs_despanned — ExactSubstr-style duplicated
# spans (Lee et al. 2021) and their removal.  One window-hash exchange
# (count-over-partition, no join-back) + one (doc, class)-keyed islands
# merge (operators/dedup.py:duplicated_spans / remove_duplicated_spans).
# Both oracles share ONE CTE chain so the spans semantics cannot drift
# between the detect query and the removal query.
# ---------------------------------------------------------------------------
_SPAN_K = 8


def _spans_cte(keep_first: bool) -> str:
    """Shared oracle CTE chain ending in ``spans(doc_id, s, e, prot)``.

    keep_first=False: every repeated-window occurrence is a span,
    prot is always FALSE.  keep_first=True: the min-(doc,pos)
    occurrence of each window becomes a PROTECTED span (prot TRUE),
    later copies are duplicated spans — mirroring the Spark operator's
    two classes, islands merged within (doc, class).
    """
    if keep_first:
        rn_col = (
            ",\n                 row_number() OVER "
            "(PARTITION BY g ORDER BY doc_id, p) AS rn"
        )
        prot = "rn = 1"
    else:  # no rn: don't pay an unused per-gram sort in detect-all mode
        rn_col = ""
        prot = "FALSE"
    return f"""
    t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (SELECT doc_id, tok, len(tok) AS n FROM t WHERE len(tok) >= {_SPAN_K}),
    w AS (
      SELECT doc_id, i - 1 AS p,
             array_to_string(tok[i:(i+{_SPAN_K}-1)], ' ') AS g
      FROM (SELECT doc_id, tok, n,
                   unnest(generate_series(1, n - {_SPAN_K} + 1)) AS i
            FROM b)
    ),
    c AS (SELECT doc_id, p,
                 count(*) OVER (PARTITION BY g) AS cnt{rn_col}
          FROM w),
    d AS (SELECT doc_id, CAST(p AS BIGINT) AS p, ({prot}) AS prot
          FROM c WHERE cnt >= 2),
    m AS (
      SELECT doc_id, p, prot,
             CASE WHEN p >= coalesce(max(p + {_SPAN_K}) OVER (
                 PARTITION BY doc_id, prot ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
      FROM d
    ),
    s AS (SELECT doc_id, p, prot,
                 sum(brk) OVER (PARTITION BY doc_id, prot ORDER BY p) AS isl
          FROM m),
    spans AS (
      SELECT doc_id, prot, min(p) AS s, max(p) + {_SPAN_K} AS e
      FROM s GROUP BY doc_id, prot, isl
    )"""


@register(
    "docs_duplicated_spans",
    oracle=f"""
    WITH {_spans_cte(keep_first=False)}
    SELECT doc_id,
           s AS span_start,
           CAST(e AS BIGINT) AS span_end,
           CAST(e - s AS BIGINT) AS span_tokens
    FROM spans
    """,
)
def docs_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.duplicated_spans(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        k=_SPAN_K, min_count=2,
    )


# docs_despanned applies the paper's "all but one occurrence" rule:
# a token is removed iff a duplicated span covers it AND no protected
# (first-occurrence) span does, so the kept copy survives even under
# self-overlapping repeats.  NULL text counts as zero tokens on both
# engines.
@register(
    "docs_despanned",
    oracle=f"""
    WITH {_spans_cte(keep_first=True)},
    ex AS (
      SELECT doc_id, i - 1 AS p, tok[i] AS tk
      FROM (SELECT doc_id, tok,
                   unnest(generate_series(1, len(tok))) AS i
            FROM t WHERE len(tok) > 0)
    ),
    kept AS (
      SELECT x.doc_id,
             count(*) AS n_kept,
             coalesce(string_agg(x.tk, ' ' ORDER BY x.p), '') AS cleaned
      FROM ex x
      WHERE NOT EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = x.doc_id AND NOT sp.prot
          AND x.p >= sp.s AND x.p < sp.e
      )
      OR EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = x.doc_id AND sp.prot
          AND x.p >= sp.s AND x.p < sp.e
      )
      GROUP BY x.doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(len(t.tok), 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(len(t.tok), 0) - coalesce(k.n_kept, 0) AS BIGINT)
             AS n_removed,
           coalesce(k.cleaned, '') AS cleaned_text
    FROM t LEFT JOIN kept k USING (doc_id)
    """,
)
def docs_despanned(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    spans = dedup.duplicated_spans(
        docs, "doc_id", "text", k=_SPAN_K, min_count=2, keep_first=True
    )
    return dedup.remove_duplicated_spans(
        docs, spans, "doc_id", "text", keep_first=True
    )


# ---------------------------------------------------------------------------
# docs_duplicated_spans_incremental — the daily-crawl span tier: docs
# with doc_id % 5 = 0 play the new batch, the rest the historical
# corpus reduced to its STORED window-hash index
# (operators/dedup.py:window_hash_index).  A batch window is duplicated
# when batch + historical occurrences reach 2; history is never
# re-windowed (only its (hash, count) index is joined), and old x old
# spans are never enumerated — O(batch) on the batch side, completing
# the incremental story across all three dedup granularities
# (exact whole-doc, LSH near-dup, spans).
# ---------------------------------------------------------------------------
@register(
    "docs_duplicated_spans_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    hw AS (
      SELECT array_to_string(tok[i:(i+{_SPAN_K}-1)], ' ') AS g,
             count(*) AS hist_cnt
      FROM (SELECT tok, unnest(generate_series(1, len(tok) - {_SPAN_K} + 1)) AS i
            FROM t WHERE doc_id % 5 <> 0 AND len(tok) >= {_SPAN_K})
      GROUP BY g
    ),
    w AS (
      SELECT doc_id, i - 1 AS p,
             array_to_string(tok[i:(i+{_SPAN_K}-1)], ' ') AS g
      FROM (SELECT doc_id, tok, unnest(generate_series(1, len(tok) - {_SPAN_K} + 1)) AS i
            FROM t WHERE doc_id % 5 = 0 AND len(tok) >= {_SPAN_K})
    ),
    c AS (
      SELECT w.doc_id, w.p,
             count(*) OVER (PARTITION BY w.g) + coalesce(hw.hist_cnt, 0) AS total
      FROM w LEFT JOIN hw USING (g)
    ),
    d AS (SELECT doc_id, CAST(p AS BIGINT) AS p FROM c WHERE total >= 2),
    m AS (
      SELECT doc_id, p,
             CASE WHEN p >= coalesce(max(p + {_SPAN_K}) OVER (
                 PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
      FROM d
    ),
    s AS (SELECT doc_id, p,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS isl
          FROM m)
    SELECT doc_id,
           min(p) AS span_start,
           CAST(max(p) + {_SPAN_K} AS BIGINT) AS span_end,
           CAST(max(p) + {_SPAN_K} - min(p) AS BIGINT) AS span_tokens
    FROM s GROUP BY doc_id, isl
    """,
)
def docs_duplicated_spans_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    # In production the index side is the STORED (hash, count) table
    # persisted at ingest, not a re-window of the corpus.
    index = dedup.window_hash_index(docs.filter(~is_new), "text", k=_SPAN_K)
    return dedup.duplicated_spans_incremental(
        docs.filter(is_new), index, "doc_id", "text", k=_SPAN_K, min_count=2
    )


# ---------------------------------------------------------------------------
# docs_despanned_incremental — the daily-crawl REMOVAL path end to end:
# incremental keep-first spans for the batch (temporal-first — a window
# already in the stored index had its kept copy at ingest, so every
# batch occurrence is unprotected; a corpus-new window protects its
# batch-first occurrence) fed straight into the token-level span
# removal.  What a production pipeline actually runs on each crawl:
# clean the new batch against history without re-windowing history.
# ---------------------------------------------------------------------------
@register(
    "docs_despanned_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    hw AS (
      SELECT array_to_string(tok[i:(i+{_SPAN_K}-1)], ' ') AS g,
             count(*) AS hist_cnt
      FROM (SELECT tok, unnest(generate_series(1, len(tok) - {_SPAN_K} + 1)) AS i
            FROM t WHERE doc_id % 5 <> 0 AND len(tok) >= {_SPAN_K})
      GROUP BY g
    ),
    w AS (
      SELECT doc_id, i - 1 AS p,
             array_to_string(tok[i:(i+{_SPAN_K}-1)], ' ') AS g
      FROM (SELECT doc_id, tok, unnest(generate_series(1, len(tok) - {_SPAN_K} + 1)) AS i
            FROM t WHERE doc_id % 5 = 0 AND len(tok) >= {_SPAN_K})
    ),
    c AS (
      SELECT w.doc_id, w.p,
             count(*) OVER (PARTITION BY w.g) + coalesce(hw.hist_cnt, 0)
               AS total,
             row_number() OVER (PARTITION BY w.g ORDER BY w.doc_id, w.p)
               AS rn,
             hw.hist_cnt
      FROM w LEFT JOIN hw USING (g)
    ),
    d AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
                 (hist_cnt IS NULL AND rn = 1) AS prot
          FROM c WHERE total >= 2),
    m AS (
      SELECT doc_id, p, prot,
             CASE WHEN p >= coalesce(max(p + {_SPAN_K}) OVER (
                 PARTITION BY doc_id, prot ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
      FROM d
    ),
    s AS (SELECT doc_id, p, prot,
                 sum(brk) OVER (PARTITION BY doc_id, prot ORDER BY p) AS isl
          FROM m),
    spans AS (
      SELECT doc_id, prot, min(p) AS sp_s, max(p) + {_SPAN_K} AS sp_e
      FROM s GROUP BY doc_id, prot, isl
    ),
    tb AS (SELECT doc_id, tok FROM t WHERE doc_id % 5 = 0),
    ex AS (
      SELECT doc_id, i - 1 AS p, tok[i] AS tk
      FROM (SELECT doc_id, tok,
                   unnest(generate_series(1, len(tok))) AS i
            FROM tb WHERE len(tok) > 0)
    ),
    kept AS (
      SELECT x.doc_id,
             count(*) AS n_kept,
             coalesce(string_agg(x.tk, ' ' ORDER BY x.p), '') AS cleaned
      FROM ex x
      WHERE NOT EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = x.doc_id AND NOT sp.prot
          AND x.p >= sp.sp_s AND x.p < sp.sp_e
      )
      OR EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = x.doc_id AND sp.prot
          AND x.p >= sp.sp_s AND x.p < sp.sp_e
      )
      GROUP BY x.doc_id
    )
    SELECT tb.doc_id,
           CAST(coalesce(len(tb.tok), 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(len(tb.tok), 0) - coalesce(k.n_kept, 0) AS BIGINT)
             AS n_removed,
           coalesce(k.cleaned, '') AS cleaned_text
    FROM tb LEFT JOIN kept k USING (doc_id)
    """,
)
def docs_despanned_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    batch = docs.filter(is_new)
    index = dedup.window_hash_index(docs.filter(~is_new), "text", k=_SPAN_K)
    spans = dedup.duplicated_spans_incremental(
        batch, index, "doc_id", "text", k=_SPAN_K, min_count=2, keep_first=True
    )
    return dedup.remove_duplicated_spans(
        batch, spans, "doc_id", "text", keep_first=True
    )


# ---------------------------------------------------------------------------
# docs_adaptive_length_filter — per-LANGUAGE adaptive length cutoffs
# (p05/p95 of token count) instead of one global Gopher-style bound:
# the thresholds real multilingual pipelines derive per subcorpus, since
# a normal length in zh is an outlier in en.  Exact interpolated
# percentiles (Spark `percentile` == DuckDB `quantile_cont`, both
# linear interpolation — order-independent, hash-stable); the per-lang
# threshold table is tiny and broadcast back onto the map-only scan.
# Scale note: exact percentile sorts each group — at 100 TB switch the
# threshold pass to approx_percentile (t-digest, mergeable sketch);
# exact kept here because the oracle gate needs determinism.
# ---------------------------------------------------------------------------
@register(
    "docs_adaptive_length_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, CAST(len({_TOK}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    b AS (SELECT doc_id, lang, n_tokens FROM t WHERE n_tokens > 0),
    s AS (
      SELECT lang,
             CAST(round(quantile_cont(n_tokens, 0.05), 6) AS DOUBLE) AS lo,
             CAST(round(quantile_cont(n_tokens, 0.95), 6) AS DOUBLE) AS hi
      FROM b GROUP BY lang
    )
    SELECT b.doc_id, b.lang, b.n_tokens, s.lo, s.hi,
           (b.n_tokens >= s.lo AND b.n_tokens <= s.hi) AS keep
    FROM b JOIN s USING (lang)
    """,
)
def docs_adaptive_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        F.size(tokens_expr(F.col("text"))).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    stats = base.groupBy("lang").agg(
        F.round(F.expr("percentile(n_tokens, 0.05D)"), 6).alias("lo"),
        F.round(F.expr("percentile(n_tokens, 0.95D)"), 6).alias("hi"),
    )
    return base.join(F.broadcast(stats), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        "lo",
        "hi",
        (
            (F.col("n_tokens") >= F.col("lo"))
            & (F.col("n_tokens") <= F.col("hi"))
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# docs_stats_drift — dataset-drift PSI between two corpus snapshots
# (operators/drift.py): the data-distribution leg of the monitoring
# story, next to the recall/AUC diagnostics.  The fixture has one
# documents table, so the two "daily snapshots" are the deterministic
# doc_id-parity split (even = reference baseline, odd = current) — the
# same stored-state stand-in the streaming dedup entry uses.  Five
# features over a PINNED bucket space (the bootstrap-artifact pattern
# — a bucket space that moved with the data would measure itself):
# three numeric with fixed edges (text length, punctuation ratio,
# digit ratio), and language + source mixes against pinned
# vocabularies (unlisted values fold to "<other>" — a surge there IS
# the signal; r11: the source leg moved from open categorical to a
# pinned vocab so the template spec is bounded at 100 TB by default).
# Bucketing, the eps-clamp, and the PSI fold are generated from ONE
# feature spec for both engines (psi_drift / psi_drift_sql), so the
# semantics cannot drift between the query and its oracle.  Plan: two
# column-pruned scans → two tiny (feature, bucket) aggregates →
# full-outer join + per-feature fold, everything after the scans
# KB-sized.
# ---------------------------------------------------------------------------
_PUNCT_SQL = (
    "CASE WHEN length(text) > 0 THEN "
    "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))"
    " AS DOUBLE) / length(text) END"
)
_DIGIT_SQL = (
    "CASE WHEN length(text) > 0 THEN "
    "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))"
    " AS DOUBLE) / length(text) END"
)


def _drift_oracle() -> str:
    from ..operators.drift import (
        LANG_DRIFT_VOCAB,
        SOURCE_DRIFT_VOCAB,
        TEXT_DRIFT_EDGES,
        psi_drift_sql,
    )

    feats = [
        ("chars", "CAST(length(text) AS DOUBLE)", TEXT_DRIFT_EDGES["chars"]),
        ("punct_ratio", _PUNCT_SQL, TEXT_DRIFT_EDGES["punct_ratio"]),
        ("digit_ratio", _DIGIT_SQL, TEXT_DRIFT_EDGES["digit_ratio"]),
        ("lang_mix", "lang", LANG_DRIFT_VOCAB),
        ("source_mix", "source", SOURCE_DRIFT_VOCAB),
    ]
    # cur is `<> 0`, not `= 1`: `%` keeps the dividend's sign in both
    # engines, so `= 1` would silently drop odd NEGATIVE doc_ids from
    # the drift measure — `<> 0` makes the split total (NULL ids are
    # excluded from both sides by both forms alike).
    return psi_drift_sql(
        "SELECT text, lang, source FROM documents WHERE doc_id % 2 = 0",
        "SELECT text, lang, source FROM documents WHERE doc_id % 2 <> 0",
        feats,
    )


@register("docs_stats_drift", oracle=_drift_oracle())
def docs_stats_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import corpus_drift_features, psi_drift

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 != 0)
    return psi_drift(ref, cur, corpus_drift_features())


# ---------------------------------------------------------------------------
# docs_stats_drift_stream — STREAMING dataset-drift (r10 verdict #3;
# streaming/drift.py): the current snapshot arrives as three
# doc_id-ordered micro-batches; each batch's (feature, bucket) count
# DELTA folds into a stored count table (counts are additive — the
# span_index delta-log pattern, so history is never rescanned) and
# per-batch PSI vs the PINNED baseline artifact appends to a
# monitoring log.  The exact additive fold makes the drained result
# equal the one-shot batch PSI regardless of chunking, so the SAME
# docs_stats_drift oracle gates the real streaming machinery
# (foreachBatch sink, stored-state fold, checkpointing).  State is
# vocabulary-sized by construction (the pinned bucket space bounds
# every delta).  Excluded from bench HEADLINE and the plan-shape gate
# like the other streaming entries; the oracle compare is its gate.
# ---------------------------------------------------------------------------
@register("docs_stats_drift_stream", oracle=_drift_oracle())
def docs_stats_drift_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.drift import bucket_counts, corpus_drift_features
    from ..streaming.drift import psi_stream_into_counts
    from ..streaming.semantic import stage_id_ordered_chunks

    docs = load_table(spark, sf_dir, "documents")
    feats = corpus_drift_features()
    baseline = bucket_counts(docs.filter(F.col("doc_id") % 2 == 0), feats)
    chunk_dir = stage_id_ordered_chunks(
        spark, os.path.join(sf_dir, "documents.parquet"), "doc_id",
        n_chunks=3,
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(chunk_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
        # the arriving feed IS the current snapshot: the parity filter
        # mirrors the batch entry's `cur` side (`!= 0` keeps negative
        # odd ids — the split must stay total)
        .filter(F.col("doc_id") % 2 != 0)
    )
    # fresh per invocation (stored counts + psi log + checkpoint live
    # under it); the result is pinned off the temp files so the state
    # dir can be removed before returning instead of leaking per run
    state_dir = tempfile.mkdtemp(prefix="drift_stream_")
    try:
        out = psi_stream_into_counts(
            stream, spark, feats, state_dir, baseline
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    return out
