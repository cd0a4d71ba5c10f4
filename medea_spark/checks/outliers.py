"""Robust outlier screening via median / MAD (modified z-score).

The classic robust univariate screen (Iglewicz & Hoaglin): a value is
an outlier when ``|x - median| > threshold * 1.4826 * MAD`` where
``MAD = median(|x - median|)`` and 1.4826 is the consistency constant
that makes MAD estimate sigma under normality.  Mean/stddev screens
are themselves corrupted by the outliers they hunt; median/MAD have a
50% breakdown point, which is why data-validation suites (Deequ-style
anomaly detection) prefer them.

Plan shape: THREE aggregate passes over the (column-pruned) input —
medians, then MADs (needs the medians), then outlier counts (needs
both) — each a single map-side-combined hash aggregate producing one
row, carried forward via broadcast cross joins (no driver collect in
the plan).  At 100 TB use ``approx=True`` (default): Greenwald-Khanna
``percentile_approx`` keeps every pass bounded-memory and mergeable.
The exact path exists for oracle differentials — Spark exact
``percentile`` is bit-identical to DuckDB ``quantile_cont`` (linear
interpolation, same IEEE arithmetic), so medians, MADs, and therefore
every outlier verdict agree across engines.

Edge case: a column whose majority value repeats (MAD = 0) flags every
value different from the median — the documented modified-z behavior
(any deviation has infinite robust z).  NULLs are excluded from
medians (both engines skip NULLs in percentile/quantile_cont) and
from the outlier counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Consistency constant: MAD * 1.4826 estimates sigma for normal data.
MAD_SCALE = 1.4826


def mad_outliers(
    df: DataFrame,
    cols: list[str],
    threshold: float = 3.5,
    approx: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Long-format robust-outlier report, one row per column:
    ``(col_name, n_values, median, mad, n_outliers, outlier_rate)``.

    ``threshold`` is on the modified z-score scale (3.5 is the
    Iglewicz-Hoaglin recommendation).  ``approx=True`` (the 100 TB
    answer) uses ``percentile_approx``; ``approx=False`` is the exact,
    engine-portable path the DuckDB oracle replays."""
    if not cols:
        raise ValueError("mad_outliers needs at least one column")
    fn = "percentile_approx" if approx else "percentile"
    extra = f", {accuracy}" if approx else ""

    med = df.agg(
        *[
            F.expr(f"{fn}(cast(`{c}` as double), 0.5{extra})").alias(f"{c}__med")
            for c in cols
        ]
    )
    mad = (
        df.crossJoin(F.broadcast(med))
        .agg(
            *[
                F.expr(
                    f"{fn}(abs(cast(`{c}` as double) - `{c}__med`), 0.5{extra})"
                ).alias(f"{c}__mad")
                for c in cols
            ],
            *[F.first(f"{c}__med").alias(f"{c}__med") for c in cols],
        )
    )
    cutoff = {
        c: F.lit(threshold) * F.lit(MAD_SCALE) * F.col(f"{c}__mad") for c in cols
    }
    dev = {c: F.abs(F.col(c).cast("double") - F.col(f"{c}__med")) for c in cols}
    counted = df.crossJoin(F.broadcast(mad)).agg(
        *[F.count(F.col(c)).alias(f"{c}__n") for c in cols],
        *[
            F.sum((dev[c] > cutoff[c]).cast("long")).alias(f"{c}__out")
            for c in cols
        ],
        *[F.first(f"{c}__med").alias(f"{c}__med") for c in cols],
        *[F.first(f"{c}__mad").alias(f"{c}__mad") for c in cols],
    )
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__med`, `{c}__mad`, `{c}__out`" for c in cols
    )
    return counted.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, n_values, median, mad, n_outliers)"
    ).withColumn(
        "outlier_rate",
        F.round(F.col("n_outliers") / F.greatest(F.col("n_values"), F.lit(1)), 6),
    )
