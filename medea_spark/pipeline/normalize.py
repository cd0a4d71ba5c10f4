"""Unicode normalization for text corpora.

Mixed-source corpora carry the same visible text in different byte
forms (precomposed ``é`` vs ``e`` + combining acute), which breaks
exact dedup, fingerprints, and n-gram matching.  The fix is canonical
normalization (NFC by default) BEFORE any hashing op.

Spark has no built-in Unicode normalizer, so this is one of the few
places the engine runs Python — strictly inside Arrow batches
(``pandas_udf``), per the repo invariant.  Both Python's
``unicodedata`` and DuckDB's utf8proc implement the same Unicode
canonical algorithm, so the normalized output is an engine
differential, not merely a convention.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_text(col: Column | str, form: str = "NFC") -> Column:
    """Canonically-normalized text (Arrow-batched; NULL-safe)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    c = F.col(col) if isinstance(col, str) else col

    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    # explicit returnType: stringified type hints break under
    # `from __future__ import annotations` (repo gotcha)
    udf = F.pandas_udf(_norm, "string").asNondeterministic()
    return udf(c)


def normalize_table(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "normalized",
    form: str = "NFC",
) -> DataFrame:
    """Input rows plus the normalized text and an ``is_changed`` flag
    (rows already in canonical form pass through byte-identical — the
    flag lets a pipeline skip rewriting untouched partitions)."""
    out = df.withColumn(out_col, normalize_text(F.col(text_col), form))
    return out.withColumn(
        "is_changed", ~F.col(out_col).eqNullSafe(F.col(text_col))
    )
