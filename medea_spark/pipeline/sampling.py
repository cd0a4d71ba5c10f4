"""Deterministic sampling for training-data pipelines.

Training mixes need samples that are (a) reproducible across reruns and
engines — no ``rand()``, no ``TABLESAMPLE`` — and (b) cheap at 100 TB:
a pure columnar hash predicate that pushes into the scan stage, never a
shuffle, never a driver round-trip.  Rows are kept when the md5-derived
60-bit hash of their key lands below ``rate`` of the hash space, so the
SAME rows are chosen on every engine (the DuckDB oracle reproduces the
selection bit-exactly via ``conv(substr(md5(..),1,15),16,10)``) and a
resumed/restarted job re-selects identical rows — the same determinism
contract as the engine's partitioning (engine/partitioning.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hash space of the md5-portable 60-bit family (dedup._md5_hash64).
_HASH_SPACE = 1 << 60


def _sample_hash(key: Column, seed: int) -> Column:
    """md5-portable 60-bit hash of ``seed || ':' || key``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key)), 1, 15), 16, 10
    ).cast("long")


def sample_predicate(key: Column, rate: float | Column, seed: int = 42) -> Column:
    """Boolean keep-predicate: deterministic ``rate`` fraction by key.

    A rate column may be supplied (per-row rates — see
    :func:`stratified_sample`); the threshold multiply stays integral
    enough at double precision for any human-scale rate."""
    rate_col = rate if isinstance(rate, Column) else F.lit(float(rate))
    return _sample_hash(key, seed) < (rate_col * F.lit(float(_HASH_SPACE))).cast(
        "long"
    )


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 42
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, selected by the
    hash of ``key_col`` — same rows every run, every engine."""
    return df.filter(sample_predicate(F.col(key_col).cast("string"), rate, seed))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own keep-rate (e.g. downsample boilerplate languages, keep all of a
    rare one).  ``rates`` is a small driver-side dict → one chained
    CASE over literals; the predicate is pure codegen and pushes into
    the scan, so at 100 TB this is a filtered scan, not a job."""
    rate_col: Column = F.lit(float(default_rate))
    for value, rate in sorted(rates.items()):
        rate_col = F.when(F.col(strata_col) == value, F.lit(float(rate))).otherwise(
            rate_col
        )
    return df.filter(sample_predicate(F.col(key_col).cast("string"), rate_col, seed))
