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
