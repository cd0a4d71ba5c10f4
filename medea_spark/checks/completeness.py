"""Timeline-completeness check: find missing time buckets in an event
stream (SURVEY.md §2.C data-quality extension — the freshness/
completeness contract every ingestion pipeline wants: "we expect at
least one event every <granularity>; which buckets are silent?").

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
