"""PII scrubbing for training corpora: detect-and-replace with
placeholder tokens, plus per-document redaction counts.

The standard pre-training hygiene pass (emails, IPv4 addresses,
international phone numbers → ``<EMAIL>``/``<IP>``/``<PHONE>``),
implemented as pure ``regexp_replace``/``regexp_count`` column
expressions — JVM-side, whole-stage codegen, no Python, no shuffle
beyond whatever the caller does with the result.  One row in, one row
out, at any scale.

Patterns deliberately use the common subset of Java regex (Spark) and
RE2 (DuckDB/Go) — no backrefs, no lookaround — so the oracle replays
the identical scrub.  This is a pattern scrub, not NER: names and
free-form addresses need a model and are out of scope (documented, not
silently half-done).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (regex, replacement token); insertion order IS application
#: order (emails first so the phone pattern cannot eat an address's
#: digit run, IPs before phones for the same reason).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d{9,15}\b", "<PHONE>"),
}


def redact_pii(col: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Scrubbed text: every match of each kind (in ``PII_PATTERNS``
    order) replaced by its placeholder token."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds or tuple(PII_PATTERNS):
        pat, token = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(col: Column | str, kinds: tuple[str, ...] | None = None) -> list[Column]:
    """``n_{kind}`` count columns — how many redactions each kind
    would make (counted on the PRE-redaction text, in the same
    sequential order as :func:`redact_pii`, so counts always equal the
    number of tokens actually substituted)."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for kind in kinds or tuple(PII_PATTERNS):
        pat, token = PII_PATTERNS[kind]
        out.append(F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}"))
        c = F.regexp_replace(c, pat, token)
    return out


def scrub_table(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Input rows plus the redacted text and per-kind counts — the
    whole scrub is one codegen projection."""
    return df.select(
        "*",
        redact_pii(F.col(text_col), kinds).alias(out_col),
        *pii_counts(F.col(text_col), kinds),
    )
