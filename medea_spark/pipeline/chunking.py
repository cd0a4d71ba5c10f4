"""Document chunking: fixed-token windows with overlap.

The training-prep step between cleaning and tokenization: long
documents split into ~N-token chunks with a small overlap so no
context is lost at the seams.  Pure columnar — tokens staged once per
row (pinned, per the repo's SPARK-36718 convention), chunk windows
built by one ``transform`` over the start offsets, then ``posexplode``
— no Python, no shuffle, and the output explode is bounded by
|tokens| / stride per row.

Chunk math (the standard sliding window): ``stride = chunk_tokens -
overlap``; a document of ``n`` tokens yields ``1 + ceil((n -
chunk_tokens) / stride)`` chunks (one when ``n <= chunk_tokens``;
empty documents yield a single empty chunk row, so every input row is
represented downstream).  The last chunk may be shorter than
``chunk_tokens``; it is never extended past the document.

Tokens are the whitespace tokens of the raw text (no case folding —
chunk text must round-trip the original wording); the arithmetic and
``array_to_string`` reconstruction are engine-portable, so the whole
relation is differential-testable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_id, n_chunks, chunk_start, chunk_len, chunk_text) —
    one row per sliding window.  ``chunk_start`` is the 0-based token
    offset; ``chunk_id`` is 0-based and dense per document."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    if overlap < 0:
        # negative overlap silently makes stride > chunk_tokens, dropping
        # the tokens between consecutive windows (round-5 advice)
        raise ValueError("overlap must be >= 0")
    stride = chunk_tokens - overlap
    c = F.col(text_col)
    t = F.trim(c)
    toks_expr = F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))
    staged = df.select(F.col(id_col), toks_expr.alias("_toks")).select(
        F.col(id_col),
        # real output column AND the stage pin (SPARK-36718): without
        # it the tokenization would re-run once per chunk window
        F.size("_toks").alias("n_tokens"),
        F.col("_toks"),
    )
    n = F.col("n_tokens")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * stride).alias("start"),
            F.least(n - i * stride, F.lit(chunk_tokens)).alias("len"),
            F.concat_ws(
                " ", F.slice(F.col("_toks"), i * stride + 1, chunk_tokens)
            ).alias("text"),
        ),
    )
    exploded = staged.select(
        F.col(id_col),
        "n_tokens",
        n_chunks.alias("n_chunks"),
        F.posexplode(chunks).alias("chunk_id", "_c"),
    )
    return exploded.select(
        F.col(id_col),
        "n_tokens",
        "n_chunks",
        "chunk_id",
        F.col("_c.start").alias("chunk_start"),
        F.col("_c.len").alias("chunk_len"),
        F.col("_c.text").alias("chunk_text"),
    )
