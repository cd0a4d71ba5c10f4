"""Per-column statistics (SURVEY.md §2.C C8/C9/C13/C14).

All single-pass, whole-stage-codegen aggregates: one ``agg`` computes
count / null count / min / max / approx-distinct for every requested
column simultaneously, then an ``unpivot``-style projection reshapes
the one-row result into the long (column, metric...) relation — no
per-column jobs, no driver loop over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame, cols: list[str] | None = None, rsd: float = 0.05, exact_distinct: bool = False
) -> DataFrame:
    """Long-format per-column stats: (column, n_rows, n_nulls, null_rate,
    min_value, max_value, distinct_count).

    ``distinct_count`` uses HLL++ (``approx_count_distinct``) by default
    — the 100 TB answer; ``exact_distinct=True`` switches to exact
    count-distinct for oracle comparisons at test scale.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"{c}__distinct"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__min`, `{c}__max`, `{c}__distinct`"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, n_rows, n_nulls, min_value, max_value, distinct_count)"
    ).withColumn(
        "null_rate",
        F.round(F.col("n_nulls") / F.greatest(F.col("n_rows"), F.lit(1)), 6),
    ).select(
        "col_name", "n_rows", "n_nulls", "null_rate", "min_value", "max_value", "distinct_count"
    )


def column_quantiles(
    df: DataFrame,
    cols: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    approx: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Long-format per-column quantiles: (col_name, prob, value) — one
    aggregate pass for every (column, probability) pair.

    ``approx=True`` (default, the 100 TB answer) uses
    ``approx_percentile`` — a bounded-memory, mergeable Greenwald-Khanna
    sketch whose rank error is ≤ 1/``accuracy``.  The exact path
    (``approx=False``) buffers every value of each column in the
    aggregation — fine at test scale and bit-identical to DuckDB's
    ``quantile_cont`` (linear interpolation on the sorted values, same
    IEEE arithmetic — the oracle differential), but NOT for 100 TB.
    NULLs are ignored by both engines; an all-NULL column yields NULL
    quantiles."""
    if not cols:
        raise ValueError("column_quantiles needs at least one column")
    plist = list(probs)
    fn = "percentile_approx" if approx else "percentile"
    extra = f", {accuracy}" if approx else ""
    one = df.agg(
        *[
            F.expr(
                f"{fn}(`{c}`, array({', '.join(map(repr, plist))}){extra})"
            ).alias(f"{c}__q")
            for c in cols
        ]
    )
    stack_args = ", ".join(
        f"'{c}', {repr(p)}D, cast(`{c}__q`[{i}] as double)"
        for c in cols
        for i, p in enumerate(plist)
    )
    return one.selectExpr(
        f"stack({len(cols) * len(plist)}, {stack_args}) as (col_name, prob, value)"
    )


def top_k(df: DataFrame, group_cols: list[str], k: int = 10) -> DataFrame:
    """Top-k groups by count, with deterministic tie-breaking.  A
    global sort of an aggregated (small) relation — Catalyst runs it
    as TakeOrderedAndProject, no full sort at scale."""
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), *[F.asc(c) for c in group_cols])
        .limit(k)
    )


def diff_tables(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set-op diffing for fixture/golden comparisons (C14): rows only in
    ``a`` (side='a_only') and only in ``b`` (side='b_only'), multiset
    semantics (exceptAll)."""
    a_only = a.exceptAll(b).withColumn("side", F.lit("a_only"))
    b_only = b.exceptAll(a).withColumn("side", F.lit("b_only"))
    return a_only.unionByName(b_only)
