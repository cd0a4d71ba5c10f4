"""Text-analysis operators for training-data pipelines.

All pure built-in `pyspark.sql.functions` expressions — JVM-side,
whole-stage-codegen, no Python in the hot path.  Each returns a column
or a DataFrame transformation usable at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A compact stopword list shared with oracle SQL (keep sorted + lowercase).
STOPWORDS = ("a", "an", "and", "in", "is", "of", "or", "the", "to")

# BPE-ish tokenization: alpha runs, digit runs, or single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_bpe(col: Column | str) -> Column:
    """Regex token count approximating a BPE pre-tokenizer's segments."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    stops = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    return F.round(stops / F.greatest(F.size(words), F.lit(1)), 6)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-space characters that are punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    no_space = F.regexp_replace(c, r"\s", "")
    punct = F.length(F.regexp_replace(no_space, r"[A-Za-z0-9]", ""))
    return F.round(punct / F.greatest(F.length(no_space), F.lit(1)), 6)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    reasonable stopword density (the classic C4-style filters, folded
    into one score so it can be thresholded in a single pass)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tokens = token_count_ws(c)
    len_ok = (n_tokens >= 10) & (n_tokens <= 100_000)
    punct_ok = punct_ratio(c) <= 0.2
    stop_ok = stopword_ratio(c) >= 0.01
    return F.round(
        (len_ok.cast("double") + punct_ok.cast("double") + stop_ok.cast("double")) / 3.0,
        6,
    )


# Deterministic per-language marker words for the n-gram/keyword
# language-ID heuristic (shared with oracle SQL).
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}


def lang_id(col: Column | str) -> Column:
    """Keyword-marker language guess; 'unknown' when no marker hits.
    Ties break by the fixed language order en > de > fr > es."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    expr = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):
        markers = LANG_MARKERS[lang]
        hits = F.size(F.filter(words, lambda w: w.isin(*markers)))
        expr = F.when(hits > 0, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — identical across engines (md5 is bit-stable everywhere)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(normalized)


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per document with every text statistic."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_bpe(c).alias("n_tokens_bpe"),
        stopword_ratio(c).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        quality_score(c).alias("quality_score"),
        lang_id(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )
