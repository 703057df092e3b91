"""Multi-dimensional data layout: Z-order (Morton) clustering keys for
data-skipping file layouts.

A 100 TB table range-partitioned on one column skips files for
predicates on THAT column only; interleaving the bits of two (or more)
sort dimensions into one Morton key and range-partitioning on it gives
every interleaved dimension locality, so parquet min/max pruning cuts
file reads for predicates on ANY of them (the Delta/Iceberg OPTIMIZE
ZORDER strategy, done here with plain repartitionByRange + sorted
write — no table format required).

The bit-spread is the classic magic-number doubling scheme (shift-or
then mask with 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555
constants) — pure integer ops, identical in Spark and DuckDB, so
z-values are oracle-checkable exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spread masks for 16 -> 32 bit interleave (part1by1)
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of c so bit i lands at position 2i.
    Forces bigint first: a 32-bit int input overflows to negative at
    the final interleave (z reaches 2^32 - 1)."""
    x = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(x: Column, y: Column) -> Column:
    """32-bit Morton key interleaving the low 16 bits of x (even
    positions) and y (odd positions).  Inputs are masked to 16 bits;
    callers map raw columns into [0, 65536) first (modulo for ids,
    day-number for dates, quantile bucket for doubles — rank-based
    bucketing preserves locality better for skewed values)."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def write_zordered(
    df: DataFrame,
    x: Column,
    y: Column,
    path: str,
    num_files: int = 64,
) -> None:
    """Write parquet clustered by z-value: range-partition on the
    Morton key (num_files ~ target file count) and sort within
    partitions, so each file covers a compact z-range — i.e. a small
    rectangle in (x, y) space — and its parquet min/max stats prune
    scans for predicates on either dimension."""
    (
        df.withColumn("_z", zvalue(x, y))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
