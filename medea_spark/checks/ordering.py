"""Per-key ordering contract: rows where a value regresses against the
declared monotonic direction within its key's sequence (SURVEY.md §2.C
data-quality extension — the CDC/event-log contract "within each
entity, timestamps must not go backwards / sequence numbers must
strictly increase").

Plan shape: ONE exchange on the key columns (unavoidable for per-key
ordering — same shape as sessionization) followed by a sort and a
``lag`` window; the violation filter runs inside the window stage, so
only violating rows survive to the output.  Skew on a hot key is the
same exposure as any per-key window — bounded by that key's row count,
not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = {
    # direction -> violation predicate on (prev, cur)
    "nondecreasing": lambda prev, cur: prev > cur,
    "strict_increasing": lambda prev, cur: prev >= cur,
    "nonincreasing": lambda prev, cur: prev < cur,
    "strict_decreasing": lambda prev, cur: prev <= cur,
}


def monotonic_violations(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    value_col: str,
    direction: str = "nondecreasing",
) -> DataFrame:
    """Rows whose ``value_col`` violates ``direction`` relative to the
    previous row within ``key_cols`` ordered by ``order_col`` —
    ``(key..., order_col, prev_value, value)``, ordered by key and
    sequence.  The first row of each key has no predecessor and cannot
    violate.  Rows with NULL ``value_col`` carry no information: they
    are never violations themselves and the comparison against a NULL
    predecessor is NULL → filtered out, so a NULL breaks the chain
    rather than poisoning it.

    ``order_col`` must be unique per key (a sequence number, an event
    id) — ties would make ``lag`` nondeterministic and the check
    unreproducible across engines and runs."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {sorted(_DIRECTIONS)}")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    prev = F.lag(value_col).over(w)
    out = (
        df.select(*key_cols, order_col, value_col)
        .withColumn("prev_value", prev)
        .filter(_DIRECTIONS[direction](F.col("prev_value"), F.col(value_col)))
    )
    return out.select(
        *key_cols, order_col, "prev_value", F.col(value_col).alias("value")
    ).orderBy(*key_cols, order_col)
