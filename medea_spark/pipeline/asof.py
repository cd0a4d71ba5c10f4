"""Generic as-of join (backward): latest right row with
``right_ts <= left_ts``, optionally per equi-key.

Spark has no built-in as-of join; the naive shape —
``left JOIN right ON key AND r.ts <= l.ts`` then argmax per left row —
materializes |left| × |history-per-key| intermediate rows and needs a
rank window on top (two scale problems).  This implementation never
expands: the right side is grouped ONCE into a per-key time-sorted
history array, the (broadcast-able) arrays join on the equi-key, and a
codegen ``aggregate`` scan picks the latest element ≤ the probe
timestamp per row — O(|history|) per row inside whole-stage codegen,
zero extra shuffle on the probe side, no row blowup, no window.

This is the dimension-snapshot join of a feature/training pipeline
(user profile as of event time, exchange rate as of trade time); the
schema-history special case with a GLOBAL literal history lives in
``engine/temporal.py`` (zero join at all).  DuckDB's native ASOF JOIN
reproduces the semantics exactly — the oracle differential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
    broadcast_right: bool = True,
    max_history: int | None = None,
    on_overflow: str = "error",
    assert_unique_ts: bool = False,
) -> DataFrame:
    """Left as-of join: every left row gains ``{prefix}{right_ts}`` and
    ``{prefix}{col}`` for each value column, from the latest right row
    of the same ``by`` key with ``right_ts <= left_ts`` — NULLs when no
    such row exists.  Ties on ``right_ts`` within a key break by the
    value-struct ordering (deterministic); keep right keys unique per
    timestamp for well-defined semantics.

    ``broadcast_right=True`` (default) fits the dimension-history case
    (small right side); at a right side too big to broadcast, the
    grouped-array join becomes a plain shuffle join on ``by`` — still
    no row blowup and no window.

    **Hot-key guard**: each key's entire right history materializes as
    ONE array inside a task, so a pathological key with millions of
    history rows would OOM at scale.  ``max_history=N`` bounds it:
    ``on_overflow="error"`` fails the job loudly (the task raises the
    moment a key exceeds N — no silent wrong answer), while
    ``on_overflow="latest"`` keeps only each key's N most-recent
    history rows, which preserves as-of answers for every probe at or
    after that key's (N+1)-latest timestamp and returns NULL/older-
    truncated matches below it (documented lossy policy for
    bounded-staleness probes).  ``max_history=None`` (default) is
    unbounded — the dimension-snapshot contract.

    ``assert_unique_ts=True`` enforces the tie precondition at
    runtime: a key with two right rows at the same timestamp fails the
    job (riding the same history aggregation — no extra pass).  Use it
    under differential gates, where engines may break ties
    differently."""
    if not by:
        raise ValueError(
            "asof_join requires at least one equi-key; for a global "
            "(keyless) history use engine/temporal.py's literal-boundary "
            "assignment — it needs no join at all"
        )
    if on_overflow not in ("error", "latest"):
        raise ValueError(f"on_overflow must be 'error' or 'latest', got {on_overflow!r}")
    if max_history is not None and max_history < 1:
        raise ValueError("max_history must be >= 1")
    vcols = value_cols or [
        c for c in right.columns if c not in set(by) | {right_ts}
    ]
    taken = set(left.columns)
    clashes = sorted(
        ({"_hist", "_asof"} | {f"{prefix}{c}" for c in [right_ts, *vcols]}) & taken
    )
    if clashes:
        raise ValueError(
            f"asof_join output/temp column(s) {clashes} already exist on the "
            f"left DataFrame; rename them or pass a different prefix="
        )
    hist_elem = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in vcols]
    )
    agg_cols = [F.sort_array(F.collect_list(hist_elem)).alias("_hist")]
    if assert_unique_ts:
        agg_cols += [
            F.count(right_ts).alias("_n_ts"),
            F.countDistinct(right_ts).alias("_nd_ts"),
        ]
    rhist = right.groupBy(*by).agg(*agg_cols)
    if assert_unique_ts:
        rhist = rhist.withColumn(
            "_hist",
            F.when(
                F.col("_n_ts") != F.col("_nd_ts"),
                F.raise_error(
                    F.concat(
                        F.lit("asof_join: duplicate right timestamps within a key ("),
                        (F.col("_n_ts") - F.col("_nd_ts")).cast("string"),
                        F.lit(" surplus); tie-break would be engine-specific"),
                    )
                ),
            ).otherwise(F.col("_hist")),
        ).drop("_n_ts", "_nd_ts")
    if max_history is not None:
        h, n = F.col("_hist"), F.size(F.col("_hist"))
        if on_overflow == "error":
            bounded = F.when(
                n > max_history,
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"asof_join: key history exceeds max_history={max_history} "
                            "(size "
                        ),
                        n.cast("string"),
                        F.lit("); raise max_history or use on_overflow='latest'"),
                    )
                ),
            ).otherwise(h)
        else:  # keep each key's max_history MOST RECENT rows (array is sorted asc)
            bounded = F.when(
                n > max_history, F.slice(h, n - F.lit(max_history) + 1, max_history)
            ).otherwise(h)
        rhist = rhist.withColumn("_hist", bounded)
    elem_type = dict(zip(rhist.columns, [f.dataType for f in rhist.schema.fields]))[
        "_hist"
    ].elementType
    joined = left.join(
        F.broadcast(rhist) if broadcast_right else rhist, on=by, how="left"
    )
    lts = F.col(left_ts)
    picked = F.aggregate(
        F.coalesce(F.col("_hist"), F.array().cast(f"array<{elem_type.simpleString()}>")),
        F.lit(None).cast(elem_type),
        lambda acc, x: F.when(x["_ts"] <= lts, x).otherwise(acc),
    )
    out = joined.withColumn("_asof", picked).drop("_hist")
    out = out.withColumn(f"{prefix}{right_ts}", F.col("_asof._ts"))
    for c in vcols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_asof.{c}"))
    return out.drop("_asof")
