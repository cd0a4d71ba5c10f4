"""MERGE-style upsert for path-backed tables (SCD1 semantics).

Iceberg/Delta get ``MERGE INTO`` from the table format; plain-parquet
pipelines still need the operation — apply a batch of
updated/late-arriving rows to a base snapshot, producing the next
snapshot.  This is the incremental-revalidation entry point: merge the
changed documents in, then validate only the affected partitions
(checkpoint/store.py prunes the rest).

Semantics of :func:`merge_upsert`:

* a key present in both sides takes the UPDATE row (updates win),
* keys only in base / only in updates pass through,
* each side must be unique per key — duplicates within a side make
  "which row wins" undefined, so ``assert_unique=True`` (opt-in; it
  aggregates BOTH sides, which on the base side is a full extra
  shuffle over the big table plus a blocking collect — keep it on in
  tests, off in production where the contract is already enforced
  upstream).

100-TB shape: ONE shuffle — both sides hash-partition on the key for
the full-outer join; no window, no sort.  The base side is the big
one; the join keys are the table's primary key, so skew is bounded by
key cardinality (unique keys → no skew).  Column sets must match
(unionByName discipline); extra update columns are an error, not a
silent drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    assert_unique: bool = False,
) -> DataFrame:
    """Next-snapshot relation: updates override base per key, new keys
    append.  Columns = base's columns (update side must carry the same
    set)."""
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    if set(base.columns) != set(updates.columns):
        extra = set(updates.columns) ^ set(base.columns)
        raise ValueError(f"column sets differ between base and updates: {sorted(extra)}")
    clashes = [
        c for c in base.columns if c == "_has_u" or c.startswith("_u_")
    ]
    if clashes:
        raise ValueError(
            f"column names {clashes} collide with merge_upsert's internal "
            f"markers ('_has_u', '_u_<col>') — rename them first"
        )
    if assert_unique:
        # ONE eager job for both sides: tag and union, group once —
        # two per-side collect jobs paid double task-launch latency for
        # row counts this check never needs to scale with.
        tagged = base.select(
            F.lit("base").alias("_side"), *[F.col(k) for k in keys]
        ).unionByName(
            updates.select(F.lit("updates").alias("_side"), *[F.col(k) for k in keys])
        )
        dup = (
            tagged.groupBy("_side", *keys)
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .orderBy("_side")
            .limit(1)
            .collect()
        )
        if dup:
            vals = {k: dup[0][k] for k in keys}
            raise ValueError(f"duplicate key in {dup[0]['_side']}: {vals}")

    payload = [c for c in base.columns if c not in keys]
    u = updates.select(*keys, *[F.col(c).alias(f"_u_{c}") for c in payload]).withColumn(
        "_has_u", F.lit(True)
    )
    joined = base.join(u, keys, "full_outer")
    # updates win WHEN the update row exists — per-column coalesce would
    # resurrect base values under an update row's legitimate NULLs.
    take_update = F.col("_has_u").isNotNull()
    return joined.select(
        *keys,
        *[
            F.when(take_update, F.col(f"_u_{c}")).otherwise(F.col(c)).alias(c)
            for c in payload
        ],
    )
