"""Timeline-completeness check: find missing time buckets in an event
stream (SURVEY.md §2.C data-quality extension — the freshness/
completeness contract every ingestion pipeline wants: "we expect at
least one event every <granularity>; which buckets are silent?"),
plus a robust per-bucket volume-anomaly screen on the same zero-filled
timeline ("did ingestion spike or stall?").

Plan shape: one DISTINCT hash aggregate (map-side combined) collapses
the stream to its observed bucket universe — calendar-sized, never
row-sized — then the expected universe is generated from the observed
min/max with ``sequence`` (a single driver-sized row exploded in one
task; a full year of minutes is ~525k values) and anti-joined against
the observed buckets.  Both sides of the anti-join are bucket-universe
sized, so Spark broadcasts; no shuffle touches row-scale data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRANULARITIES = ("minute", "hour", "day", "week", "month")


def time_gaps(
    df: DataFrame, ts_col: str, granularity: str = "hour"
) -> DataFrame:
    """One row per missing time bucket between the observed min and max
    of ``ts_col`` truncated to ``granularity`` — ``(bucket)``, ordered.
    An empty result means the timeline is complete at that granularity.
    NULL timestamps are ignored; an empty input yields an empty result
    (never a countdown ``sequence``: the observed bounds always satisfy
    lo <= hi when any bucket exists)."""
    if granularity not in _GRANULARITIES:
        raise ValueError(f"granularity must be one of {_GRANULARITIES}")
    observed = (
        df.select(F.date_trunc(granularity, F.col(ts_col)).alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .distinct()
    )
    bounds = observed.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    expected = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval 1 {granularity}"))
        ).alias("bucket")
    )
    return expected.join(observed, "bucket", "left_anti").orderBy("bucket")


def volume_anomalies(
    df: DataFrame,
    ts_col: str,
    granularity: str = "day",
    threshold: float = 3.5,
) -> DataFrame:
    """Per-bucket row-volume anomaly screen: buckets whose event count
    deviates from the corpus's typical bucket volume by more than
    ``threshold`` robust (modified) z-scores — the "did ingestion
    spike or stall on Tuesday?" monitor.  Returns
    ``(bucket, cnt, median_cnt, mad_cnt, modified_z)`` for anomalous
    buckets only, ordered by bucket.

    The timeline is ZERO-FILLED first (same ``sequence`` trick as
    :func:`time_gaps`): a bucket with no rows at all is the most
    anomalous volume of all and must not silently drop out of the
    screen.  ``modified_z = 0.6745 * (cnt - median) / MAD`` (Iglewicz &
    Hoaglin); when MAD = 0 (majority-constant volumes) any deviation
    from the median is flagged, mirroring ``mad_outliers``.

    Scale shape: ONE map-side-combined hash aggregate collapses rows
    to calendar-sized (bucket, cnt); everything after — zero-fill,
    exact median/MAD (bit-identical to DuckDB ``quantile_cont``) as
    stacked whole-frame window aggregates over the single
    calendar-sized partition, flagging — evaluates the pipeline
    exactly once (chained percentile aggregates would re-run the scan
    once per statistic)."""
    if granularity not in _GRANULARITIES:
        raise ValueError(f"granularity must be one of {_GRANULARITIES}")
    counts = (
        df.select(F.date_trunc(granularity, F.col(ts_col)).alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bounds = counts.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    expected = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval 1 {granularity}"))
        ).alias("bucket")
    )
    filled = expected.join(counts, "bucket", "left_outer").select(
        "bucket", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    # median and MAD as stacked whole-frame window aggregates over the
    # single calendar-sized partition: chained percentile AGGREGATES
    # would re-evaluate the scan→agg chain once per statistic (3 full
    # passes at 100 TB); as windows the pipeline evaluates exactly once
    from pyspark.sql import Window

    wall = Window.partitionBy()
    dev = filled.withColumn(
        "median_cnt", F.expr("percentile(cnt, 0.5)").over(wall)
    ).withColumn("abs_dev", F.abs(F.col("cnt") - F.col("median_cnt")))
    scored = dev.withColumn(
        "mad_cnt", F.expr("percentile(abs_dev, 0.5)").over(wall)
    ).select(
        "bucket",
        "cnt",
        "median_cnt",
        "mad_cnt",
        # raw IEEE double, deliberately NOT rounded: Spark round() (shortest-
        # repr BigDecimal HALF_UP) and DuckDB round() (scaled-float) disagree
        # on half-ties that grid-like counts actually produce, while the
        # unrounded doubles are bit-identical across engines
        F.when(
            F.col("mad_cnt") > 0,
            0.6745 * (F.col("cnt") - F.col("median_cnt")) / F.col("mad_cnt"),
        ).alias("modified_z"),
    )
    return scored.filter(
        (F.col("mad_cnt") > 0) & (F.abs(F.col("modified_z")) > threshold)
        | (F.col("mad_cnt") == 0) & (F.col("cnt") != F.col("median_cnt"))
    ).orderBy("bucket")
