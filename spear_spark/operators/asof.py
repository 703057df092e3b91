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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value: str,
    id_col: str,
    tolerance_us: int,
    result_prefix: str = "nearest",
) -> DataFrame:
    """Nearest-neighbour as-of join: for each left row, the right row
    with the smallest ``|right.ts - left.ts|`` within ``tolerance_us``
    microseconds, per ``on`` key (both directions — the TimescaleDB /
    kdb+ ``aj`` nearest variant; :func:`asof_join_last` is the
    backward-only case).  Appends ``{prefix}_id`` / ``{prefix}_value``
    (null when nothing qualifies).

    Ties are pinned exactly: equal distance prefers the earlier
    (backward) row; equal timestamps within a side break on ``id_col``
    (backward → highest id = last in sort order, forward → lowest).

    Scale shape: the same union + single shuffle + single sort as
    :func:`asof_join_last` — the backward candidate is
    ``last(ignorenulls)`` over UNBOUNDED PRECEDING..CURRENT and the
    forward candidate ``first(ignorenulls)`` over CURRENT..UNBOUNDED
    FOLLOWING; both frames share one partitioning + ordering, so Spark
    plans ONE Exchange + ONE Sort (two frames inside the window stage,
    no second shuffle, no per-row subquery, no pair explosion).
    """
    b, f = f"_{result_prefix}_b", f"_{result_prefix}_f"
    left_cols = [c for c in left.columns if c not in (on, ts, id_col)]
    rv = F.struct(
        F.unix_micros(F.col(ts)).alias("t"),
        F.col(id_col).cast("long").alias("i"),
        F.col(value).alias("v"),
    )
    r = right.select(
        F.col(on),
        F.col(ts),
        F.col(id_col).alias("_rid"),
        F.lit(0).alias("_side"),
        rv.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(on),
        F.col(ts),
        F.col(id_col).alias("_rid"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c) for c in left_cols],
    )
    order = [F.col(ts).asc(), F.col("_side").asc(), F.col("_rid").asc()]
    wb = W.partitionBy(on).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = W.partitionBy(on).orderBy(*order).rowsBetween(W.currentRow, W.unboundedFollowing)
    stacked = (
        r.unionByName(l)
        .withColumn(b, F.last("_rv", ignorenulls=True).over(wb))
        .withColumn(f, F.first("_rv", ignorenulls=True).over(wf))
    )
    now = F.unix_micros(F.col(ts))
    db = now - F.col(b)["t"]
    df_ = F.col(f)["t"] - now
    bok = F.col(b).isNotNull() & (db <= F.lit(int(tolerance_us)))
    fok = F.col(f).isNotNull() & (df_ <= F.lit(int(tolerance_us)))
    pick = (
        F.when(bok & (~fok | (db <= df_)), F.col(b))
        .when(fok, F.col(f))
        .otherwise(F.lit(None).cast(r.schema["_rv"].dataType))
    )
    return (
        stacked.filter(F.col("_side") == 1)
        .withColumn("_pick", pick)
        .select(
            F.col(on),
            F.col(ts),
            F.col("_rid").alias(id_col),
            *[F.col(c) for c in left_cols],
            F.col("_pick")["i"].alias(f"{result_prefix}_id"),
            F.col("_pick")["v"].alias(f"{result_prefix}_value"),
        )
    )
