"""Uniqueness / duplicate-key detection via salted hash aggregation
(SURVEY.md §2.C C10; north rule: "uniqueness over (repo,path,commit)
via salted hash-aggregation").

Catalyst already does partial (map-side) + final hash aggregation for a
plain ``groupBy(keys).count()``.  The explicit *salted two-phase*
variant additionally protects the final exchange when a single key is
pathologically hot (a repeated (repo,path,commit) appearing billions of
times): phase 1 groups by (keys, partition-local salt) so no reducer
receives a whole hot key; phase 2 re-aggregates the (already tiny)
per-salt partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: list[str], salted: bool = True, salt_buckets: int = 32) -> DataFrame:
    """Keys appearing more than once: (keys..., dup_count)."""
    if salted:
        phase1 = (
            df.select(*keys)
            .withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets)))
            .groupBy(*keys, "_salt")
            .agg(F.count(F.lit(1)).alias("_partial"))
        )
        counted = phase1.groupBy(*keys).agg(F.sum("_partial").alias("dup_count"))
    else:
        counted = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("dup_count"))
    return counted.filter(F.col("dup_count") > 1)


def uniqueness_report(df: DataFrame, keys: list[str], salted: bool = True) -> DataFrame:
    """One-row summary: total rows, distinct keys, duplicate keys,
    surplus rows (rows that would be dropped by a dedup)."""
    dups = duplicate_keys(df, keys, salted=salted)
    agg = dups.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("duplicate_keys"),
        F.coalesce(F.sum(F.col("dup_count") - 1), F.lit(0)).alias("surplus_rows"),
    )
    total = df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("distinct_keys"),
    )
    return total.crossJoin(agg)
