"""Z-order data layout: multi-dimensional clustering for scan pruning.

The lakehouse optimization Delta's ``OPTIMIZE ZORDER BY`` popularized,
as a plain-parquet composition: quantize each clustering column to a
fixed-width integer, interleave the bits into one Morton (Z-curve)
value, range-partition + sort the table by it, and write.  Rows close
in ALL clustered dimensions land in the same parquet row groups, so
the footer min/max statistics prune multi-predicate scans that a
single-column sort can only prune on its leading column.

At 100 TB this is the difference between "filter on (user, time)
reads one file in a thousand" and "reads every file": parquet
predicate pushdown works exactly as well as the layout lets it.

Everything is deterministic codegen bit math — quantization bounds
are EXPLICIT (caller-supplied), not sampled, so a rewrite of the same
input produces the same layout (the engine's checkpoint-resume
contract) and the z-value is reproducible in any engine (the DuckDB
oracle replays it bit-for-bit).  The bit spread uses the classic
shift-or-mask doubling trick — ~20 long ops per dimension, no UDF,
no CaseWhen nesting (CLAUDE.md: guards multiply codegen compile).

The one shuffle is the exchange that the write REQUIRES to cluster at
all; within partitions it's a local sort.  The exchange key is an
EQUAL-WIDTH z-bucket (``z div ceil(2^zbits / num_files)``), hashed to
a partition — NOT ``repartitionByRange``, whose RangePartitioner
derives its reservoir-sample seed from the RDD id, making file
boundaries run-dependent and breaking the determinism contract above.
The trade: a partition may hold several non-adjacent whole buckets
(hash collisions) and skewed data can unbalance buckets, but every
partition still sorts by z, so parquet ROW-GROUP min/max stay tight
and pruning power is preserved (the footer-stats test measures it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Spread masks for interleaving one 16-bit / 21-bit value into every
# 2nd / 3rd bit of a 64-bit long (2-D and 3-D Morton codes).
_SPREAD_2D = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)
_SPREAD_3D = (
    (32, 0x001F00000000FFFF),
    (16, 0x001F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)


def _spread_bits(x: Column, ndims: int) -> Column:
    """Insert ndims-1 zero bits between consecutive bits of ``x``."""
    table = _SPREAD_2D if ndims == 2 else _SPREAD_3D
    for shift, mask in table:
        # Column | / & are LOGICAL ops in PySpark — bitwise needs the
        # explicit methods.
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def quantize(col: Column | str, lo: float, hi: float, bits: int) -> Column:
    """Linear quantization of a numeric column into [0, 2^bits):
    ``floor((x - lo) / (hi - lo) * 2^bits)`` clamped to the range.
    NULL quantizes to 0 (start of the curve).  Bounds are explicit —
    from domain knowledge or a prior column_stats read — never sampled
    inside the write path."""
    if hi <= lo:
        raise ValueError(f"quantize needs hi > lo, got [{lo}, {hi}]")
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    q = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * n)
    # coalesce BEFORE the clamp: least/greatest SKIP nulls (both Spark
    # and DuckDB), so a null fed into least(q, n-1) would come out n-1.
    return F.greatest(
        F.least(F.coalesce(q, F.lit(0)), F.lit(n - 1)), F.lit(0)
    ).cast("long")


def zvalue(quantized: list[Column], bits: int) -> Column:
    """Morton-interleave 2 or 3 already-quantized integer columns
    (each in [0, 2^bits)) into one long z-value.  ``bits`` ≤ 16 for
    2-D, ≤ 21 for 3-D (the result must fit 63 bits)."""
    ndims = len(quantized)
    if ndims not in (2, 3):
        raise ValueError(f"zvalue interleaves 2 or 3 columns, got {ndims}")
    if bits > (16 if ndims == 2 else 21):
        raise ValueError(f"bits={bits} too wide for {ndims}-D interleave")
    z = F.lit(0).cast("long")
    for i, q in enumerate(quantized):
        z = z.bitwiseOR(F.shiftleft(_spread_bits(q.cast("long"), ndims), i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    by: list[tuple[str, float, float]],
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of the ``by``
    columns — each entry (column, lo, hi) supplies the quantization
    bounds.  ``num_files`` output partitions = files; pick it so a
    partition fits executor memory at the target scale.  The bucket →
    partition assignment is pure deterministic bit math (no sampling),
    so rewriting the same input reproduces the same files."""
    zbits = len(by) * bits
    bucket_width = -((1 << zbits) // -num_files)  # ceil(2^zbits / n)
    z = zvalue([quantize(c, lo, hi, bits) for c, lo, hi in by], bits)
    (
        df.withColumn("_z", z)
        .withColumn("_zb", F.expr(f"_z div {bucket_width}"))
        .repartition(num_files, F.col("_zb"))
        .sortWithinPartitions("_z")
        .drop("_z", "_zb")
        .write.mode(mode)
        .parquet(path)
    )
