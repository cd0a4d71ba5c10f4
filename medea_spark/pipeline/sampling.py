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

from pyspark.sql import Column, DataFrame, Window
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


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic multi-way split assignment (train/val/test): every
    row lands in exactly one named split, chosen by where the
    md5-portable hash of its key falls on the unit interval carved
    into cumulative weight segments (insertion order of ``splits``).

    Pure codegen CASE over the hash — no shuffle, no rand(), pushes
    into the scan like the samplers.  Thresholds are computed ONCE in
    Python as exact integers of the 60-bit hash space and embedded as
    literals, so engines replaying the same ints agree bit-exactly
    and rerun/resume assigns every row identically.  Weights must sum
    to 1 (±1e-9); the last segment is closed at the full hash space so
    float truncation can never leave a row unassigned.

    NULL keys hash to NULL and get a NULL split — visible and
    filterable, never silently piled into the last segment (which
    would contaminate a held-out set with exactly the malformed
    rows).  A plain SQL CASE falls through to its ELSE on NULL, so an
    oracle replaying this on NULLable keys must wrap the CASE in an
    outer ``key IS NOT NULL`` guard.
    """
    if not splits:
        raise ValueError("splits must name at least one segment")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in splits.values()):
        raise ValueError("split weights must be non-negative")
    if split_col in df.columns:
        raise ValueError(f"column {split_col!r} already exists on the input")
    names = list(splits)
    thresholds = []
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        thresholds.append(int(cum * _HASH_SPACE))
    h = _sample_hash(F.col(key_col).cast("string"), seed)
    expr = F.lit(names[-1])
    # Build the CASE from the last open segment inward; each earlier
    # threshold takes precedence, mirroring interval order.
    for name, t in reversed(list(zip(names[:-1], thresholds))):
        expr = F.when(h < F.lit(t), F.lit(name)).otherwise(expr)
    expr = F.when(F.col(key_col).isNotNull(), expr)  # NULL key → NULL split
    return df.withColumn(split_col, expr)


def mixture_rates(
    df: DataFrame,
    strata_col: str,
    token_col,
    weights: dict[str, float],
    token_budget: int,
) -> dict[str, float]:
    """Per-stratum keep-rates that hit ``token_budget`` total tokens at
    the target mixture ``weights`` (e.g. 60%% en / 20%% de / 20%% fr).

    One partial-aggregated groupBy over (strata, tokens) — a tiny
    driver-side dict comes back, never rows.  ``rate_s = min(1,
    budget·w_s / tokens_s)``: a stratum too small for its target share
    caps at keeping everything (the mix then under-delivers that
    stratum rather than inventing data).  ``token_col`` may be a column
    name or expression (e.g. ``token_count_ws(text)``)."""
    token_expr = F.col(token_col) if isinstance(token_col, str) else token_col
    totals = {
        r["s"]: r["t"]
        for r in df.filter(F.col(strata_col).isin(list(weights)))
        .groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(token_expr).alias("t"))
        .collect()
    }
    rates = {}
    for stratum, w in weights.items():
        total = totals.get(stratum) or 0
        rates[stratum] = 1.0 if total == 0 else min(1.0, (token_budget * w) / total)
    return rates


def build_training_mix(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    token_col,
    weights: dict[str, float],
    token_budget: int,
    seed: int = 42,
) -> tuple[DataFrame, dict[str, float]]:
    """The mix in one call: compute :func:`mixture_rates`, apply
    :func:`stratified_sample` (strata outside ``weights`` are dropped).
    Returns (sampled rows, the rates used) — rates are part of the
    lineage a reproducible training run must record."""
    rates = mixture_rates(df, strata_col, token_col, weights, token_budget)
    return (
        stratified_sample(df, strata_col, key_col, rates, default_rate=0.0, seed=seed),
        rates,
    )


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


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column | str,
    scale: float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted (Poisson-style) sampling: each row keeps
    with probability ``min(1, weight · scale)`` — quality-weighted
    corpus thinning where a doc's score IS its sampling propensity.

    Same machinery as every sampler here (md5-portable hash predicate,
    pure codegen, pushes toward the scan), so the selected row set is
    engine-reproducible bit-exactly.  NULL or negative weights keep
    nothing (rate floors at 0); ``weight·scale ≥ 1`` keeps the row with
    certainty.  The expected kept-token mass is ``scale · Σ weight`` —
    pick ``scale`` from the aggregate the way :func:`mixture_rates`
    does for strata.

    A NaN weight keeps the row with certainty in BOTH engines (Spark
    and DuckDB order NaN above every double, so ``least(1, …)`` picks
    1) — screen NaNs out upstream if that is not the intent.
    """
    if scale < 0:
        raise ValueError(f"scale must be >= 0, got {scale}")
    w = F.col(weight) if isinstance(weight, str) else weight
    rate = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), F.coalesce(w, F.lit(0.0)) * F.lit(float(scale)))
    )
    return df.filter(sample_predicate(F.col(key_col).cast("string"), rate, seed))


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    key: Column | str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic k-per-group sample — the "show me a few examples
    of every language / source / violation class" inspect read.

    Selection is rank-by-portable-hash: each row's md5-derived 60-bit
    hash of ``seed || ':' || key`` orders the group, the k smallest
    win (hash ties broken by key).  Same contract as every sampler
    here: no rand(), rerun-stable, reproducible bit-exactly by any
    engine with md5 — and UNIFORM per group because the hash is
    uniform on the key.  Rerun-stability requires the key to uniquely
    identify rows within its group (the hash of the key IS the row's
    identity, exactly as in :func:`sample_predicate`): rows sharing a
    key value hash identically, so which of them takes which rank is
    engine/partition-order dependent.

    Adds ``sample_rank`` (1-based) to the kept rows.

    100-TB shape: one hash exchange on the group columns + a
    partition-local rank — the same single-window shape as topk; the
    sampled output is k·|groups| rows.  For heavily-skewed groups at
    extreme scale, pre-filter with ``sample_predicate`` at a few× the
    expected rate first, then rank exactly.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not group_cols:
        raise ValueError("sample_per_group needs at least one group column")
    if "sample_rank" in df.columns:
        raise ValueError(
            "input already has a 'sample_rank' column — rename it first "
            "(silent overwrite is the asof_join collision bug class)"
        )
    key_col = F.col(key) if isinstance(key, str) else key
    h = _sample_hash(key_col.cast("string"), seed)
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), key_col.cast("string").asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
