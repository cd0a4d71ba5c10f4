"""Referential integrity via broadcast anti-join (SURVEY.md §2.C C11;
north rule: "referential integrity of commit→repo via broadcast join").

The dimension side (the repo universe) is small relative to the fact
table, so we force a broadcast-hash anti-join: no shuffle of the fact
table at all — each task streams its rows past an in-memory hash set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
) -> DataFrame:
    """Fact rows whose key has no match in the dimension."""
    dim_key = dim_key or fact_key
    dim_keys = F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct())
    return fact.join(dim_keys, on=fact_key, how="left_anti")


def referential_report(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
) -> DataFrame:
    """Per-orphan-key violation counts: (key, orphan_rows)."""
    return (
        orphan_rows(fact, dim, fact_key, dim_key)
        .groupBy(fact_key)
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
        .orderBy(F.desc("orphan_rows"), F.asc(fact_key))
    )
