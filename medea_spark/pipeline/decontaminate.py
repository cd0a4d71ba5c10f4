"""Eval-set decontamination: n-gram overlap between a training corpus
and a benchmark/eval set.

Standard training-data hygiene (the GPT-3/PaLM-style 8-13-gram scan):
a corpus document is CONTAMINATED when it shares long word n-grams
with an evaluation document — those rows must be surfaced (and usually
dropped) before training, or the benchmark leaks into the weights.

100-TB shape: the eval side is small (benchmarks are thousands of
documents, not billions), so its distinct n-gram hashes BROADCAST;
the corpus side explodes to (doc, ngram-hash) pairs that broadcast-join
and partially aggregate map-side — the corpus text never shuffles, and
the single exchange carries only per-document aggregate rows.  The
n-gram hash is the repo's portable 60-bit md5 (identical in DuckDB),
so the whole report is engine-differential-testable bit-for-bit.

Normalization matches the repo's text conventions: lowercase,
non-alphanumerics collapsed to single spaces, whitespace tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: normalization shared with the DuckDB oracle (keep in sync)
_NORM_RE = "[^a-z0-9]+"


def _norm_tokens(col):
    """lowercased alnum-only whitespace tokens; empty text → empty array."""
    t = F.trim(F.regexp_replace(F.lower(col), _NORM_RE, " "))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def ngram_hashes(col, n: int = 8):
    """Distinct 60-bit portable hashes of the normalized word n-grams
    of ``col``.  Documents shorter than ``n`` tokens have none (an
    n-gram membership test needs n tokens — standard decontamination
    semantics).  ``sequence(1, 0)`` counts DOWN in Spark, hence the
    explicit short-document guard."""
    toks = _norm_tokens(col)
    k = F.size(toks)
    grams = F.when(
        k < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k - n + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return F.array_distinct(
        F.transform(
            grams,
            lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_text: str = "text",
    n: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-corpus-document contamination report:
    ``(doc_id, n_ngrams, n_contaminated, contamination_ratio,
    is_contaminated)`` — distinct n-grams, how many also occur anywhere
    in the eval set, their ratio, and the ≥1-hit flag.

    Shape: eval n-gram hashes dedupe then broadcast; corpus hashes
    explode and LEFT-join them (left join, not inner: clean and
    too-short documents still get a report row with 0 hits); one
    map-side-combined groupBy on the corpus id.  The corpus text
    column is dropped before the explode — only (id, hash) pairs flow.
    Set ``broadcast_eval=False`` for a pathologically large eval side
    (falls back to a shuffle join, still no row blowup beyond the
    n-gram explode)."""
    eval_hashes = (
        eval_df.select(F.explode(ngram_hashes(F.col(eval_text), n)).alias("_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_eval:
        eval_hashes = F.broadcast(eval_hashes)
    pairs = corpus.select(
        F.col(corpus_id),
        F.explode_outer(ngram_hashes(F.col(corpus_text), n)).alias("_h"),
    )
    return (
        pairs.join(eval_hashes, "_h", "left")
        .groupBy(corpus_id)
        .agg(
            F.count("_h").alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contamination_ratio",
            F.round(
                F.col("n_contaminated") / F.greatest(F.col("n_ngrams"), F.lit(1)), 6
            ),
        )
        .withColumn("is_contaminated", F.col("n_contaminated") > 0)
    )
