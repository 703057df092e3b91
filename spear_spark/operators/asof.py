"""As-of join — for each left row, the most recent right-side value at or
before the left timestamp, per key.

The reference has no such operator (batch relational only, SURVEY §2.7);
this is a scale-path extension.  The naive formulation is a range
self-join (quadratic per key); the scalable shape used here is the
classic union + ordered window:

1. stack right rows (carrying ``value``) and left rows (value = null)
   into one relation;
2. one shuffle on the key, one per-partition sort on (ts, side);
3. ``last(value, ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING →
   CURRENT ROW picks the latest right value at or before each left row;
4. keep only left rows.

Cost at 100 TB: a single hash-partition exchange + sort — the same cost
as one sort-merge join, with no pair explosion regardless of key skew in
time. Right rows sort *before* left rows on timestamp ties, matching the
inclusive (``right.ts <= left.ts``) bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value: str,
    result: str = "asof_value",
) -> DataFrame:
    """Append ``result`` = most recent ``right.value`` with
    ``right.ts <= left.ts`` per ``on`` key (null when none exists)."""
    left_cols = [c for c in left.columns if c not in (on, ts)]

    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(value).alias(result),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[value].dataType).alias(result),
        *[F.col(c) for c in left_cols],
    )
    w = (
        W.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    stacked = r.unionByName(l).withColumn(result, F.last(result, ignorenulls=True).over(w))
    return stacked.filter(F.col("_side") == 1).select(on, ts, *left_cols, result)
