"""Relationship-cardinality and group-privacy checks.

Table-contract validators that referential integrity (broadcast
anti-join orphans, checks/referential.py) does not cover:

* :func:`relationship_violations` — the declared CARDINALITY of a join
  relationship (1:1, N:1) actually holds: a dimension key that appears
  twice silently duplicates every fact row it joins, which corrupts
  downstream aggregates without any error.  The dbt-style test, as a
  relation of offending keys.
* :func:`fd_violations` — a declared functional dependency (column
  consistency: ``X → Y``) holds within one table; violating keys are
  returned with their variant counts and min/max examples.
* :func:`k_anonymity_report` — quasi-identifier groups smaller than
  ``k``: rows whose (column combination) is shared by fewer than k
  rows are re-identifiable in released data.  The standard
  privacy-screen before publishing aggregates or samples.

Both are single hash-aggregates over their key columns (map-side
combined; only per-key counts cross the exchange) — no content
movement, engine-portable arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relationship_violations(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    expected: str = "many_to_one",
) -> DataFrame:
    """Keys violating the declared relationship cardinality:
    ``(key, left_count, right_count, violation)``.

    * ``many_to_one`` (fact → dimension): every key present on the
      right must be UNIQUE there (violation: ``duplicate_right``).
    * ``one_to_one``: unique on both sides (``duplicate_left`` /
      ``duplicate_right`` / ``duplicate_both``).

    Orphan keys (left key absent on the right) are the referential-
    integrity check's job, not this one's — compose both for a full
    contract."""
    if expected not in ("many_to_one", "one_to_one"):
        raise ValueError(f"expected must be 'many_to_one' or 'one_to_one', got {expected!r}")
    rk = right_key or left_key
    lc = (
        left.filter(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("key"))
        .agg(F.count(F.lit(1)).alias("left_count"))
    )
    rc = (
        right.filter(F.col(rk).isNotNull())
        .groupBy(F.col(rk).alias("key"))
        .agg(F.count(F.lit(1)).alias("right_count"))
    )
    joined = lc.join(rc, "key", "full_outer").select(
        "key",
        F.coalesce("left_count", F.lit(0)).alias("left_count"),
        F.coalesce("right_count", F.lit(0)).alias("right_count"),
    )
    dup_l = F.col("left_count") > 1
    dup_r = F.col("right_count") > 1
    if expected == "many_to_one":
        out = joined.filter(dup_r).withColumn("violation", F.lit("duplicate_right"))
    else:
        out = joined.filter(dup_l | dup_r).withColumn(
            "violation",
            F.when(dup_l & dup_r, F.lit("duplicate_both"))
            .when(dup_l, F.lit("duplicate_left"))
            .otherwise(F.lit("duplicate_right")),
        )
    return out


def fd_violations(
    df: DataFrame, determinant: str | list[str], dependent: str
) -> DataFrame:
    """Keys breaking a declared functional dependency ``determinant →
    dependent``: ``(*determinant, n_rows, n_variants, variant_min,
    variant_max)`` for every determinant value observed with more than
    one distinct dependent value.  Empty result = the dependency holds.

    The dbt-style column-consistency contract (one part ships from one
    supplier, one user lives in one country, ...): a violated FD means
    joins keyed on the determinant silently fan out and downstream
    "the" lookups pick an arbitrary variant.  NULL dependent values are
    ignored (``count(distinct)`` skips NULLs identically in Spark and
    DuckDB — the portable semantics); a NULL determinant forms its own
    group like any other value.  One hash aggregate, map-side combined
    — only per-key counts cross the exchange.  For a multi-column
    dependent, pre-concat the columns into one (struct-distinct NULL
    semantics differ across engines)."""
    det = [determinant] if isinstance(determinant, str) else list(determinant)
    if not det:
        raise ValueError("fd_violations needs at least one determinant column")
    dep = F.col(dependent)
    return (
        df.groupBy(*det)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(dep).alias("n_variants"),
            F.min(dep).alias("variant_min"),
            F.max(dep).alias("variant_max"),
        )
        .filter(F.col("n_variants") > 1)
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier groups below the anonymity threshold:
    ``(*quasi_cols, group_size)`` for every combination shared by
    fewer than ``k`` rows (NULL combinations included — NULL is a
    value to a re-identifier).  Empty result = the table is
    k-anonymous over those columns."""
    if not quasi_cols:
        raise ValueError("k_anonymity_report needs at least one quasi-identifier column")
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is always satisfied)")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )
