"""Text relevance scoring: TF-IDF term weights and BM25 ranking.

The retrieval half of a training-data pipeline: score documents against
query terms (quality-targeted sampling, topic bucketing, dedup-aware
search).  Both operators are built from the same two aggregates —
per-(doc, term) term frequencies and per-term document frequencies —
so the token explode is paid once and everything downstream is
hash-aggregate + broadcast joins.

Scale: the explode fans out ~tokens-per-doc rows, immediately collapsed
by a map-side partial count into the (doc, term) table; document
frequencies and the corpus constants (N, avgdl) are tiny aggregates
that broadcast.  No all-pairs stage anywhere; the one shuffle of the
(doc, term) table is the floor for any exact TF-IDF at 100 TB.

Determinism: weights are ROUND(·, 6) after fixed double formulas, so
rankings are reproducible across engines and partitionings (ties break
on term / doc id).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spear_spark.operators.text import tokens


def term_doc_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-(doc, term) frequency table: the shared base aggregate.
    The token array is materialized in its own projection *before* the
    explode (generator-adjacent expressions re-evaluate per output row
    otherwise — see dedup.shingles)."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    return (
        toks.select(id_col, F.explode("_toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_terms: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Smoothed TF-IDF weight per (doc, term):
    ``tf * (ln((N + 1) / (df_t + 1)) + 1)`` — the sklearn-style smooth
    idf, always positive.  With ``top_terms``, keeps each document's
    top-k terms (weight desc, term asc) — its keyword signature."""
    tf = term_doc_frequencies(df, text_col, id_col)
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    idf = F.log((F.col("n") + F.lit(1.0)) / (F.col("dft") + F.lit(1.0))) + F.lit(1.0)
    out = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col, "term", "tf",
            F.round(F.col("tf") * idf, decimals).alias("tfidf"),
        )
    )
    if top_terms is not None:
        w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), "term")
        out = out.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= top_terms
        ).drop("_rn")
    return out


def bm25(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """BM25 document score for a bag of query terms (Robertson/Sparck
    Jones idf): ``Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) ·
    tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.  Documents matching
    no query term are omitted (score would be 0).

    The query-term tf table is a tiny slice of the (doc, term)
    aggregate; N and avgdl are 1-row broadcasts, so the whole score is
    one filtered aggregate + broadcast joins over the corpus scan."""
    tf = term_doc_frequencies(df, text_col, id_col).filter(
        F.col("term").isin(*[str(t) for t in query_terms])
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    dl = df.select(F.col(id_col), F.size(tokens(text_col)).cast("bigint").alias("dl"))
    corpus = df.agg(
        F.count(F.lit(1)).alias("n"),
    )
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    out = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(avgdl))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_part), decimals).alias("bm25"))
    )
    if top is not None:
        out = out.orderBy(F.col("bm25").desc(), id_col).limit(top)
    return out


def corpus_surprisal(df, text_col: str, id_col: str, decimals: int = 6):
    """Per-document cross-entropy under the corpus unigram MLE
    (bits/token): ``H(d) = -(1/|d|) Σ_t c_dt · log2(c_t / C)`` — the
    unigram version of the perplexity filters (CCNet-style) that rank
    documents by how surprising they are under a corpus language model.
    Low = stereotypical/boilerplate, high = rare-token-heavy (often
    noise).  No smoothing needed: every scored token is by construction
    in the corpus, so c_t >= 1.

    Scale shape: one token explode feeding BOTH grains — per-doc counts
    and corpus counts — each a two-phase aggregate; the (doc,term) ⋈
    (term) join shuffles on the term key (posting-list sized, like
    tf-idf); C rides in as a broadcast 1-row literal.  Pure Column
    math; the unordered double sum rounds at the end (epsilon
    convention).
    """
    from pyspark.sql import functions as F

    from spear_spark.operators.text import tokens

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    doc_counts = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c_dt"))
    corpus_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_t"))
    total = toks.agg(F.count(F.lit(1)).alias("C"))
    joined = doc_counts.join(corpus_counts, "tok").crossJoin(F.broadcast(total))
    lp = F.log2(F.col("c_t").cast("double") / F.col("C").cast("double"))
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("c_dt").alias("n_tokens"),
            F.sum(F.col("c_dt").cast("double") * lp).alias("_s"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(-F.col("_s") / F.col("n_tokens").cast("double"), decimals).alias(
                "surprisal_bits"
            ),
        )
    )


def bigram_lm_score(df, text_col: str, id_col: str, k: float = 0.5, decimals: int = 6):
    """Per-document cross-entropy under the corpus BIGRAM language
    model with add-k smoothing (bits/bigram): the Markov upgrade of
    :func:`corpus_surprisal` and the shape of CCNet/KenLM-style
    perplexity filters — a doc whose word TRANSITIONS are improbable
    under the corpus scores high even when its unigrams are ordinary
    (shuffled or machine-mangled text), which is exactly what the
    unigram score cannot see.  SURVEY §2.4 extension — the reference
    has no scoring functions.

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)`` with V the corpus
    vocabulary size; score = -mean log2 P over the doc's bigram
    instances.  Docs with < 2 tokens emit no row.

    Scale shape: ONE bigram explode feeds both grains (per-doc and
    corpus counts, two-phase each) — made real by materializing the
    exploded table once (lazy ``localCheckpoint``; without it the
    scan+tokenize+explode subtree re-executes per consumer, the same
    multi-consumer trap graph.py's edge build documents); the scoring
    joins shuffle on the (w1, w2) / (w1) keys — posting-list sized,
    the same floor as tf-idf — and V rides in as a broadcast 1-row
    literal.  Unordered double sum rounds at the end (epsilon
    convention)."""
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).localCheckpoint(eager=False)
    bg = (
        staged.filter(F.size("_toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
                )
            ).alias("b"),
        )
        .select(F.col(id_col), F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .localCheckpoint(eager=False)
    )
    # (w1, w2, count) — vocab²-bounded, feeds both ctx_counts and the
    # scoring join; checkpoint so the bg aggregate runs once
    big_counts = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    ctx_counts = big_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = staged.select(F.explode("_toks").alias("w")).agg(
        F.countDistinct("w").alias("V")
    )
    doc_bg = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("c_db"))
    lp = F.log2(
        (F.col("c12").cast("double") + F.lit(float(k)))
        / (F.col("c1").cast("double") + F.lit(float(k)) * F.col("V").cast("double"))
    )
    return (
        doc_bg.join(big_counts, ["w1", "w2"])
        .join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("c_db").alias("n_bigrams"),
            F.sum(F.col("c_db").cast("double") * lp).alias("_s"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams"),
            F.round(-F.col("_s") / F.col("n_bigrams").cast("double"), decimals).alias(
                "lm_bits"
            ),
        )
    )
