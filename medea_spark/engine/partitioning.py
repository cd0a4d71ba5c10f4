"""Explicit repo-hash partitioning with deterministic skew salting.

North-rule requirement: "partitioning / shuffle / skew handled
explicitly".  At 10^12 files a handful of giant monorepos dominate row
counts; hash-partitioning by ``repo`` alone would leave a few straggler
partitions running the (CPU-bound) validation kernel long after the
rest finish.  AQE rebalances *joins* but not UDF-stage input balance,
so we salt ourselves.

Everything is deterministic (hash of data columns, never ``rand()``) so
a rerun/resume assigns every row to the same ``(part_id, salt_id)`` —
that is what makes per-partition checkpoints trustworthy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PART_ID = "part_id"
SALT_ID = "salt_id"


def detect_skewed_keys(
    df: DataFrame,
    key_col: str = "repo",
    skew_fraction: float = 0.05,
    max_keys: int = 64,
) -> list[str]:
    """Pre-pass: keys holding more than ``skew_fraction`` of all rows.

    One partial-aggregated groupBy over the key column only (column
    pruning keeps the scan narrow); the result is a tiny driver-side
    list, bounded by ``max_keys``.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt")).persist()
    try:
        # ONE driver read: the total rides the plan as a one-row
        # broadcast aggregate (the persisted counts relation feeds both
        # branches), and the threshold — max(1, int(total·fraction)),
        # int() truncation == floor for non-negative values — is
        # computed in-plan, so the previous total-collect job is gone.
        total_rel = counts.agg(F.sum("cnt").alias("_total"))
        threshold = F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.col("_total") * F.lit(skew_fraction)).cast("long"),
        )
        rows = (
            counts.crossJoin(F.broadcast(total_rel))
            .filter(F.col("cnt") >= threshold)
            .orderBy(F.desc("cnt"))
            .limit(max_keys)
            .collect()
        )
    finally:
        counts.unpersist()
    return [r[key_col] for r in rows]


def with_partition_columns(
    df: DataFrame,
    num_partitions: int,
    key_col: str = "repo",
    salt_col: str = "path",
    skewed_keys: list[str] | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Add deterministic ``part_id`` (repo-hash bucket) and ``salt_id``
    (0 for normal repos; a path-hash bucket for giant monorepos).

    ``salt_buckets`` defaults to ``4 × num_partitions``: a repo big
    enough to be salted should spread over ALL partitions, and the
    exchange re-hashes our bucket ids, so bucket granularity must be
    finer than the partition count for balls-in-bins collisions to
    average out (the 30M-row skew bench measured a fixed 16 buckets
    into 64 partitions at a 5× straggler, and exactly num_partitions
    buckets still ~3× — max bin of B balls in B bins is ~3; at 4×
    granularity each hot-bucket share is a quarter as heavy and the
    max partition load converges toward fair share)."""
    if salt_buckets is None:
        salt_buckets = 4 * num_partitions
    part = F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_partitions)).cast("int")
    if skewed_keys:
        salt = (
            F.when(
                F.col(key_col).isin(list(skewed_keys)),
                F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets)).cast("int"),
            )
            .otherwise(F.lit(0))
        )
    else:
        salt = F.lit(0)
    return df.withColumn(PART_ID, part).withColumn(SALT_ID, salt.cast("int"))


def repartition_for_validation(
    df: DataFrame,
    num_partitions: int,
    key_col: str = "repo",
    salt_col: str = "path",
    skewed_keys: list[str] | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """The single exchange of the validation pipeline: co-locate rows by
    salted repo hash so the UDF stage is balanced and every downstream
    per-partition aggregate (summaries, checkpoints) reuses this
    partitioning without another shuffle."""
    with_cols = with_partition_columns(
        df, num_partitions, key_col, salt_col, skewed_keys, salt_buckets
    )
    return with_cols.repartition(num_partitions, F.col(PART_ID), F.col(SALT_ID))
