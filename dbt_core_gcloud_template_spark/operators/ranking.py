"""Term-weighting and retrieval scoring over a document corpus.

TF-IDF and BM25 are the classic lexical relevance scores a
training-data pipeline uses for corpus analysis (what characterizes a
document), quality-weighted sampling, and query-based subset selection
("find me docs about X" at 100 TB without an index).

Shuffle discipline at scale:

- The inverted index (``explode`` of the token array) is the big
  intermediate — it shuffles once on the term key for the tf counts.
- Document frequencies are an aggregate OVER that same grouped result
  (no second pass over raw tokens).
- Per-term statistics (df, idf) are tiny — corpus-vocabulary-sized —
  and join back via broadcast; corpus scalars (N, avgdl) ride along in
  the same broadcast row.  The only non-broadcast shuffle in either
  scorer is the single term-key aggregation.
- Ranking uses integer tie-breaks after rounding, so results are
  deterministic and reproducible across engines.

Everything is JVM built-ins (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources.registry import ensure_parallelism


def _term_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl): one row per distinct term per doc, with the
    in-doc count and the doc's token length."""
    df = ensure_parallelism(df)
    tok = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col), tok.alias("_tok")).filter(F.size("_tok") > 0)
    return (
        base.select(
            id_col,
            F.size("_tok").cast("bigint").alias("dl"),
            F.explode("_tok").alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("bigint").alias("tf"), F.min("dl").alias("dl"))
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 5
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (tf * ln(N/df)).

    N = docs with ≥1 token; df = docs containing the term.  Ranking is
    by the 6-dp-rounded score with the term string as tie-break, so the
    selected set is engine-reproducible.

    Top-k is taken by aggregation (collect the doc's scored terms,
    ``array_sort`` + ``slice``), not a per-doc window: the window plan
    fully SORTS the shuffled inverted index by (doc, score) before
    discarding all but k rows, while the aggregate only sorts each
    doc's own term list — measured ~2× faster at sf0.1 and strictly
    less work at scale.  Per-group state is bounded by the doc's
    distinct-term count (≤ doc length).  Sort key (-tfidf, term) gives
    the same (score desc, term asc) tie-break as the window form.

    Output: <id_col>, term, tf, df, tfidf, rank.
    """
    tc = _term_counts(df, id_col, text_col)
    # tc feeds three consumers (df stats, N, the scored join) — without a
    # checkpoint the tokenize+explode+count subtree executes three times
    # (Catalyst plans no cross-action reuse); measured 1.6x at sf0.1
    tc = tc.localCheckpoint(eager=False)
    stats = tc.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n_docs = tc.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tc.join(F.broadcast(stats), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    packed = scored.groupBy(id_col).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("tfidf")).alias("_neg"),
                        F.col("term"),
                        F.col("tf"),
                        F.col("df"),
                        F.col("tfidf"),
                    )
                )
            ),
            1,
            top_k,
        ).alias("_top")
    )
    return packed.select(
        id_col, F.posexplode("_top").alias("_pos", "_t")
    ).select(
        id_col,
        F.col("_t.term").alias("term"),
        F.col("_t.tf").alias("tf"),
        F.col("_t.df").alias("df"),
        F.col("_t.tfidf").alias("tfidf"),
        (F.col("_pos") + 1).cast("int").alias("rank"),
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """BM25 retrieval score of every document against a bag of query
    terms; top-n by score.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) — the standard
    Robertson-Spärck-Jones form, always positive.  The token explode is
    filtered to the query terms *before* the aggregation, so the
    shuffled index contains only matching postings (at 100 TB the
    filter makes this a tiny fraction of the corpus).

    Stage shape (r14, guide §1.2/§2.4): ONE tokenize pass materializes
    (id, dl, query-filtered tokens); the corpus scalars (N, avgdl) and
    the postings both derive from that narrow checkpoint.  The earlier
    formulation tokenized the corpus twice (separate `lengths` and
    `postings` checkpoints) and re-attached dl to the postings through
    a corpus-sized broadcast join — measured 11 scheduler jobs for one
    bm25 execution; dl now rides the postings aggregate as min(dl)
    (constant per doc), so the lengths join is gone entirely.

    Output: <id_col>, n_hit_terms, score, rank.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    df_ = ensure_parallelism(df)
    tok = tokens_expr(F.col(text_col))
    base = (
        df_.select(F.col(id_col), tok.alias("_tok"))
        .filter(F.size("_tok") > 0)
        .select(
            id_col,
            F.size("_tok").cast("bigint").alias("dl"),
            F.filter("_tok", lambda t: t.isin(query_terms)).alias("_qtok"),
        )
        .localCheckpoint(eager=False)
    )
    corpus = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    postings = (
        base.select(id_col, "dl", F.explode("_qtok").alias("term"))
        .groupBy(id_col, "term")
        .agg(
            F.count("*").cast("bigint").alias("tf"),
            F.min("dl").alias("dl"),
        )
    ).localCheckpoint(eager=False)
    term_df = postings.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (F.lit(k1) + 1)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        postings.join(F.broadcast(term_df), "term")
        .join(F.broadcast(corpus))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_hit_terms"),
            F.round(F.sum(idf * tf_part), 6).alias("score"),
        )
    )
    # Distributed top-n (TakeOrderedAndProject) first; the global
    # row_number window then runs over ≤ top_n rows, not the corpus.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(top_n)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "n_hit_terms", "score", "rank"
    )


def bigram_counts(df: DataFrame, text_col: str, top_n: int = 40) -> DataFrame:
    """Corpus-level bigram frequencies (n-gram LM counts), top-n.

    Adjacent-token pairs are built with an array transform (no
    self-join on position), exploded, and counted — one shuffle on the
    bigram key with map-side partial aggregation.  Ordering is
    (count desc, bigram asc): fully integer/string-deterministic.

    Output: bigram, n_occurrences, rank.
    """
    df = ensure_parallelism(df)
    tok = tokens_expr(F.col(text_col))
    base = df.select(tok.alias("_tok")).filter(F.size("_tok") >= 2)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_tok") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("_tok", i), F.element_at("_tok", i + 1)
        ),
    )
    counted = (
        base.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
    )
    # distributed top-n, then rank the ≤ top_n survivors
    top = counted.orderBy(
        F.col("n_occurrences").desc(), F.col("bigram").asc()
    ).limit(top_n)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("bigram").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "bigram", "n_occurrences", "rank"
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_smooth: float = 0.5,
) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed bigram LM
    estimated from the SAME corpus (classic LM-based quality filter:
    gibberish and boilerplate sit in the perplexity tails).

      P(w2 | w1) = (c(w1,w2) + k) / (c1(w1) + k * V)

    where c(w1,w2) is the corpus bigram count, c1(w1) = sum of bigram
    counts starting with w1 (derived from the bigram table — no second
    pass over the corpus), and V = distinct tokens seen in any bigram
    position.  Document score = exp(mean(-ln P)) over its bigrams.

    Shuffle plan: ONE corpus-wide aggregation builds the bigram table;
    the context table c1 and the vocab scalar V are aggregates OVER
    that table (vocabulary-sized, broadcast back).  Scoring re-joins
    the exploded bigrams to the counts on the (w1,w2) key — at 100 TB
    that join shuffles |corpus bigrams| against |distinct bigrams|;
    both sides are already key-partitioned by Catalyst, and AQE splits
    skewed stopword-pair keys.  The per-doc mean is a final groupBy on
    the doc id with map-side combine.

    Output: <id_col>, n_bigrams, avg_nll, perplexity.
    """
    df = ensure_parallelism(df)
    tok = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col), tok.alias("_tok")).filter(F.size("_tok") >= 2)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_tok") - 1),
        lambda i: F.struct(
            F.element_at("_tok", i).alias("w1"),
            F.element_at("_tok", i + 1).alias("w2"),
        ),
    )
    pairs = base.select(F.col(id_col), F.explode(grams).alias("_g")).select(
        id_col, F.col("_g.w1").alias("w1"), F.col("_g.w2").alias("w2")
    )
    # pairs feeds the bigram table AND the scoring join; bg feeds c1,
    # vocab, and the join.  Catalyst plans NO ReusedExchange across
    # these consumers (verified: 4 separate parquet scans), so
    # checkpoint both — the corpus is tokenized once, and the
    # vocabulary-sized bg materializes once.  localCheckpoint writes to
    # executor-local disk, the same medium a shuffle would use.
    pairs = pairs.localCheckpoint(eager=False)
    bg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    bg = bg.localCheckpoint(eager=False)
    c1 = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        bg.select(F.explode(F.array(F.col("w1"), F.col("w2"))).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
    )
    nll = -F.log(
        (F.col("c12") + F.lit(k_smooth))
        / (F.col("c1") + F.lit(k_smooth) * F.col("v"))
    )
    return (
        pairs.join(bg, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
            F.round(F.exp(F.avg(nll)), 4).alias("perplexity"),
        )
    )
