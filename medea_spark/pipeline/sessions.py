"""Event sessionization (gap-based) for behavioral training data.

The classic operator a clickstream/training pipeline needs and Spark
has no built-in for in batch mode: group each user's events into
sessions separated by an inactivity gap.  Implemented with the standard
two-window composition — ``lag`` marks session starts, a running ``sum``
numbers them — which shuffles ONCE on the user key and stays entirely
in JVM window exec (no UDF).  At 100 TB the shuffle is keyed by user:
hundreds of millions of small groups, no skew pathology (a single user
cannot be 50%% of a clickstream the way a monorepo is 50%% of a code
corpus; if one is, the same deterministic salting as
engine/partitioning.py applies upstream).

All arithmetic is in integral microseconds (``unix_micros``) so the
DuckDB oracle (``epoch_us``) reproduces every session id and duration
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Input rows plus ``session_idx`` (1-based per user, in time order)
    and ``session_id`` (``"<user>-<idx>"``).  Ordering ties on ``ts``
    break by ``id_col`` so the assignment is fully deterministic."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_us.asc(), F.col(id_col).asc())
    new_session = (
        F.when(F.lag(ts_us).over(w).isNull(), F.lit(1))
        .when(ts_us - F.lag(ts_us).over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    sdf = df.withColumn("session_idx", F.sum(new_session).over(w).cast("int"))
    return sdf.withColumn(
        "session_id",
        F.concat(F.col(user_col).cast("string"), F.lit("-"), F.col("session_idx")),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per session: event count, first/last event id, duration
    in whole seconds (floor of the microsecond span — integral, hence
    engine-portable).  The aggregate reuses the sessionize window's
    user partitioning, so the whole thing is one exchange."""
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    ts_us = F.unix_micros(F.col(ts_col))
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.col(id_col)).alias("first_event_id"),
            F.max(F.col(id_col)).alias("last_event_id"),
            ((F.max(ts_us) - F.min(ts_us)) / F.lit(1_000_000))
            .cast("long")
            .alias("duration_sec"),
        )
    )
