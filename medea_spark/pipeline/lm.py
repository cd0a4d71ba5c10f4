"""N-gram language-model perplexity scoring — the CCNet-style quality
signal: score each document against a bigram LM trained on the corpus
(or a trusted reference corpus) and use low/high perplexity as a
quality / outlier filter for training-data curation.

All counting and scoring is built-in-function columnar (explode →
hash-agg → join → sum); no Python in the hot path.  The LM itself is a
pair of count relations, so it can be persisted as parquet and reused
across corpora (train on wiki-quality reference, score the crawl).

Model: add-alpha smoothed bigram conditional,

    p(w2 | w1) = (c(w1, w2) + alpha) / (c(w1) + alpha * V)

with V = |vocab| + 1 (one unseen-type slot).  Unseen bigrams/unigrams
fall back to the same formula with c = 0, so scoring a corpus disjoint
from the training corpus is well-defined.  Reported per document:

    n_bigrams      number of scored bigram positions (tokens - 1)
    avg_logprob    sum(ln p) / n_bigrams  (natural log)
    perplexity     exp(-avg_logprob)

Documents with < 2 tokens have no bigram positions and get NULL
avg_logprob / perplexity (not 0 — "no evidence" is not "certain").

100-TB shape: unigram/bigram counting is one hash-agg each with
map-side combine (the explode never shuffles raw text — only (w1, w2)
token pairs).  Scoring joins the exploded bigram relation against the
LM; the LM side is bounded by vocabulary size (quadratic in V at
worst, linear in observed pairs in practice) so it broadcasts — the
corpus side never shuffles.  Set ``broadcast_lm=False`` for a giant
LM and Spark plans a shuffle join on (w1, w2) instead.

Reference parity: the reference engine has no LM scorer; this is a
brief-extension operator (training-data pipeline: quality scoring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from medea_spark.pipeline.decontaminate import _norm_tokens


def _bigram_pairs(toks: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs; empty when < 2 tokens.

    Guarded with ``when`` because ``slice(x, 2, size-1)`` needs a
    non-negative length and ``sequence(1, 0)`` counts down (CLAUDE.md).
    """
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c_uni) token counts over the corpus — one explode + hash-agg."""
    toks = _norm_tokens(F.col(text_col))
    return (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, c_bi) adjacent-pair counts — one explode + hash-agg."""
    pairs = _bigram_pairs(_norm_tokens(F.col(text_col)))
    return (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )


def perplexity(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    alpha: float = 1.0,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Score each document against the bigram LM given by the two count
    relations (columns exactly ``(w, c_uni)`` and ``(w1, w2, c_bi)``).

    Returns (id_col, n_bigrams, avg_logprob, perplexity) with raw IEEE
    doubles — callers round for display.  The per-document sum runs as
    a partial (map-side combined) hash-agg keyed on the document id.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    internal = {"w", "w1", "w2", "c_bi", "c_uni", "p", "logp",
                "n_bigrams", "total_logprob"}
    if id_col in internal:
        raise ValueError(
            f"id_col {id_col!r} collides with the scorer's internal "
            f"names {sorted(internal)} — rename it first"
        )
    # V = |vocab| + 1 rides the plan as a one-row broadcast aggregate —
    # no eager count() job (round-5 verdict: one fewer job per call).
    # persist() still matters: the vocab-count branch and the scoring
    # join below both consume this relation, and an unpersisted
    # unigram_counts(docs) argument would re-run the corpus-wide
    # explode+hash-agg twice (the CLAUDE.md unpersisted-consumer
    # class).  Vocab-sized — cheap.
    unigrams = unigrams.persist()
    vocab = unigrams.agg((F.count(F.lit(1)) + F.lit(1)).alias("_V"))
    uni = unigrams.select("w", "c_uni")
    bi = bigrams.select("w1", "w2", "c_bi")
    if broadcast_lm:
        uni, bi = F.broadcast(uni), F.broadcast(bi)

    pairs = docs.select(
        F.col(id_col),
        F.explode_outer(_bigram_pairs(_norm_tokens(F.col(text_col)))).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1"), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.when(
                F.col("w1").isNotNull(),
                F.log(
                    (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(alpha))
                    # alpha·V as a JVM double product of the same two
                    # values the old Python-literal alpha*vocab_v held —
                    # bit-identical (V is an exact small integer).
                    / (F.coalesce(F.col("c_uni"), F.lit(0)) + F.lit(alpha) * F.col("_V"))
                ),
            ).alias("logp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.col("logp")).alias("n_bigrams"),
        F.sum("logp").alias("total_logprob"),
    )
    avg = F.when(
        F.col("n_bigrams") > 0, F.col("total_logprob") / F.col("n_bigrams")
    )
    return agg.select(
        F.col(id_col),
        F.col("n_bigrams"),
        avg.alias("avg_logprob"),
        F.exp(-avg).alias("perplexity"),
    )
