"""Window specs with spear's pinned defaults.

Reference parity: ``BasicWindowSpec`` / ``Window`` builder
(``/root/reference/spear-core/src/main/scala/spear/expressions/windows/WindowSpec.scala:134-205``)
and frames (``WindowSpec.scala:16-102``).

⚠ Default-frame delta (SURVEY §2.6): spear's default frame is
**ROWS** UNBOUNDED PRECEDING → CURRENT ROW (``WindowSpec.scala:78-102``),
while Spark defaults to **RANGE** UNBOUNDED PRECEDING → CURRENT ROW when
an ORDER BY is present (which treats order-by ties as one frame).  This
builder pins the ROWS frame whenever the caller orders without choosing
a frame.

The reference has no dedicated ranking functions — any aggregate can go
OVER a window (``WindowFunction.scala:6-19``); ``Column.over`` gives us
that 1:1, and Spark's ranking functions (row_number, rank, lag, lead,
ntile) come free as extensions.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SparkWindow
from pyspark.sql.window import WindowSpec as SparkWindowSpec

# Frame boundaries (WindowSpec.scala:40-76)
CURRENT_ROW = SparkWindow.currentRow
UNBOUNDED_PRECEDING = SparkWindow.unboundedPreceding
UNBOUNDED_FOLLOWING = SparkWindow.unboundedFollowing


def preceding(n: int) -> int:
    return -n


def following(n: int) -> int:
    return n


class Window:
    """Builder mirroring spear's ``Window.partitionBy/orderBy/rowsBetween/
    rangeBetween`` (``WindowSpec.scala:185-205``)."""

    def __init__(
        self,
        partition: tuple = (),
        order: tuple = (),
        frame: tuple | None = None,
    ):
        self._partition = partition
        self._order = order
        self._frame = frame  # ("rows"|"range", start, end)

    def partitionBy(self, *cols: Any) -> "Window":
        return Window(tuple(cols), self._order, self._frame)

    def orderBy(self, *cols: Any) -> "Window":
        return Window(self._partition, tuple(cols), self._frame)

    def rowsBetween(self, start: int, end: int) -> "Window":
        return Window(self._partition, self._order, ("rows", start, end))

    def rangeBetween(self, start: int, end: int) -> "Window":
        return Window(self._partition, self._order, ("range", start, end))

    def to_spark(self) -> SparkWindowSpec:
        spec = SparkWindow.partitionBy(*self._partition) if self._partition else SparkWindow.partitionBy()
        if self._order:
            spec = spec.orderBy(*self._order)
        if self._frame is not None:
            kind, start, end = self._frame
            spec = spec.rowsBetween(start, end) if kind == "rows" else spec.rangeBetween(start, end)
        elif self._order:
            # spear default frame: ROWS UNBOUNDED PRECEDING → CURRENT ROW
            spec = spec.rowsBetween(UNBOUNDED_PRECEDING, CURRENT_ROW)
        return spec


def over(expr: Column, window: Window | SparkWindowSpec) -> Column:
    """``WindowFunction(function, window)`` (``WindowFunction.scala:6-19``)."""
    spec = window.to_spark() if isinstance(window, Window) else window
    return expr.over(spec)


def partitioned_bounded_range(
    df,
    key_col: str,
    agg_exprs: dict[str, tuple[Column, "Any"]],
    preceding_range: int,
    bucket_width: int,
    following_range: int = 0,
):
    """Evaluate a GLOBAL bounded RANGE frame ``[key - preceding_range,
    key + following_range]`` at scale by partitioning the key space —
    the halo-row rewrite that removes the single-task bottleneck of an
    unpartitioned ordered window (the scale evaluation of the
    reference's RangeFrame semantics, WindowSpec.scala:16-28, whose
    boundaries are symmetric Preceding/Following — same results,
    partitioned plan).

    Every row lands in bucket ``key div bucket_width``; rows within
    ``preceding_range`` of a bucket's END are additionally copied into
    the NEXT bucket as ghost rows (they serve trailing frames there),
    and rows within ``following_range`` of a bucket's START are copied
    into the PREVIOUS bucket (they serve leading frames there) — so
    each row's frame is fully resident in its own partition (requires
    ``bucket_width`` > each range, enforced; both halos can apply to
    one row when ``preceding + following > bucket_width``).  The
    window then runs ``partitionBy(bucket)`` — per-task state is one
    bucket plus halos spanning ``preceding_range + following_range``
    keys — and ghosts are dropped after contributing.  Results are
    IDENTICAL to the global window (RANGE semantics make tie groups
    share frames; ghosts carry full rows, so sums/counts/mins see
    exactly the same frame contents).

    ``agg_exprs`` maps output column name → (value Column, agg fn),
    e.g. ``{"s": (col("x").cast("decimal(14,2)"), F.sum)}``.

    Scale shape: one projection + one bounded row duplication (halo
    share ≈ (preceding_range + following_range) / bucket_width) + ONE
    hash exchange on the bucket id.  At 100 TB pick bucket_width so a
    bucket's rows fit an executor (e.g. keys/bucket ≈ rows_per_task
    target).  Event-time frames ride the same rewrite: stage
    ``unix_micros(ts)`` as the key and express the ranges in
    microseconds (q81 covers the per-partition interval-RANGE case
    natively; this is the GLOBAL-ordering variant)."""
    if preceding_range < 0:
        raise ValueError("partitioned_bounded_range: preceding_range must be >= 0")
    if following_range < 0:
        raise ValueError("partitioned_bounded_range: following_range must be >= 0")
    if bucket_width <= preceding_range or bucket_width <= following_range:
        raise ValueError(
            "partitioned_bounded_range: bucket_width must be positive and "
            "exceed preceding_range and following_range so each halo "
            "reaches at most one neighboring bucket"
        )
    for reserved in ("_bkt", "_ghost", "_copies", "_c", "_pbr_k"):
        if reserved in df.columns:
            raise ValueError(
                f"partitioned_bounded_range: input column {reserved!r} "
                "collides with an internal name"
            )
    W = int(bucket_width)
    # stage the key under a fixed internal name so the integer-division
    # expr never string-interpolates a user column name (backtick
    # injection); double division (floor(key / W)) would lose precision
    # past 2^53 and mis-bucket snowflake-scale long keys —
    # key - pmod(key, W) is an exact multiple of W, so `div` is exact
    # for any sign
    df = df.withColumn("_pbr_k", F.col(key_col).cast("long"))
    key = F.col("_pbr_k")
    bucket = F.expr(f"(_pbr_k - pmod(_pbr_k, {W})) div {W}").cast("long")
    # SINGLE input pass: each row explodes into its own bucket plus —
    # iff it sits in the last `preceding_range` keys of the bucket —
    # a ghost copy for the next bucket (a second df reference would
    # scan the source twice; the halo predicate is computed, so no
    # pushdown could dedup the scans)
    if following_range == 0:
        # trailing-only fast path (q16's shape): at most one ghost, so
        # a two-branch WHEN beats the filtered-array general form
        in_halo = key >= (bucket + F.lit(1)) * F.lit(W) - F.lit(preceding_range)
        copies = F.when(
            in_halo,
            F.array(
                F.struct(bucket.alias("b"), F.lit(False).alias("g")),
                F.struct((bucket + 1).alias("b"), F.lit(True).alias("g")),
            ),
        ).otherwise(F.array(F.struct(bucket.alias("b"), F.lit(False).alias("g"))))
    else:
        # general form: own copy always; backward halo (last
        # `preceding_range` keys of the bucket → next bucket) and
        # forward halo (first `following_range` keys → previous
        # bucket) each behind an include flag, filtered before the
        # explode.  Both flags can be true for one row — the ghost
        # targets (b+1, b-1) are distinct buckets, so no partition
        # ever sees the same row twice.
        in_next = key >= (bucket + F.lit(1)) * F.lit(W) - F.lit(preceding_range)
        in_prev = key < bucket * F.lit(W) + F.lit(following_range)
        entries = [
            F.struct(bucket.alias("b"), F.lit(False).alias("g"), F.lit(True).alias("i")),
            F.struct((bucket + 1).alias("b"), F.lit(True).alias("g"), in_next.alias("i")),
            F.struct((bucket - 1).alias("b"), F.lit(True).alias("g"), in_prev.alias("i")),
        ]
        copies = F.filter(F.array(*entries), lambda s: s["i"])
    # explode_OUTER, deliberately: plain explode lets Catalyst infer a
    # `size(copies) > 0` constraint and push it into the scan, where it
    # re-evaluates the entire copies array expression once more per
    # input row (measured 1.5× on the symmetric path at sf0.1: 0.90s →
    # 0.61s).  The array is never empty by construction (the own-bucket
    # entry is unconditional), so outer semantics change nothing — and
    # even a hypothetical null row would carry a NULL _ghost, which the
    # final `filter(~_ghost)` drops.
    union = (
        df.withColumn("_copies", copies)
        .withColumn("_c", F.explode_outer("_copies"))
        .withColumn("_bkt", F.col("_c.b"))
        .withColumn("_ghost", F.col("_c.g"))
        .drop("_copies", "_c")
    )
    w = (
        SparkWindow.partitionBy("_bkt")
        .orderBy(key_col)
        .rangeBetween(-preceding_range, following_range)
    )
    out = union
    for name, (value, fn) in agg_exprs.items():
        out = out.withColumn(name, fn(value).over(w))
    return out.filter(~F.col("_ghost")).drop("_bkt", "_ghost", "_pbr_k")
