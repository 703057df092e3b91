"""Analysis-error parity — the facade analog of the reference's
``PostAnalysisCheckSuite.scala`` and the negative tests in
``AggregationAnalysisSuite.scala`` (``spear-core/src/test/scala/spear/
plans/logical/analysis/``): spear-illegal queries must fail FAST (the
facade analyzes eagerly, like the reference's ``Context``) and with a
message that names the offending expression — a silent wrong answer or
a late executor-side crash would both be parity failures.

The reference rule → facade behavior map:

* ``RejectUnresolvedExpressions`` / ``RejectOrphanAttributeRefs`` →
  Spark's ``UNRESOLVED_COLUMN`` at facade construction time (eager
  analysis touches ``df.schema`` per call).
* ``IllegalAggregationException`` for non-grouped SELECT fields /
  HAVING / ORDER BY references → Spark's ``MISSING_AGGREGATION`` or
  ``UNRESOLVED_COLUMN`` (the facade lowers HAVING/ORDER-BY to
  post-aggregate Filter/Sort, so an unprojected reference is simply
  unresolvable there — same rejection, different rule name).
* "Aggregate functions are not allowed in grouping keys" → Spark's
  ``GROUP_BY_AGGREGATE``.
* "Aggregate function can't be nested within another aggregate
  function" → Spark's ``NESTED_AGGREGATE_FUNCTION``.
* ``RejectDistinctAggregateFunctions`` → **documented divergence**:
  distinct aggregates are SUPPORTED here as an extension (SURVEY §2.5,
  q21) because Spark plans them natively; the test pins that they
  work rather than raise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from spear_spark.dataframe import DataFrame as SpearDF


@pytest.fixture()
def t(spark):
    return SpearDF(
        spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    )


def _message(excinfo) -> str:
    return str(excinfo.value)


class TestUnresolvedReferences:
    """``PostAnalysisCheckSuite`` 'reject unresolved expressions' /
    'reject orphan attribute references'."""

    def test_select_unknown_column_raises_eagerly(self, t):
        """``relation select 'c`` — the error fires AT THE CALL (eager
        analysis, ``Context.scala`` parity), not at collect time, and
        names the attribute."""
        with pytest.raises(AnalysisException) as ei:
            t.select("c")
        assert "c" in _message(ei)

    def test_filter_unknown_column_raises_eagerly(self, t):
        with pytest.raises(AnalysisException) as ei:
            t.filter(F.col("missing") > 0)
        assert "missing" in _message(ei)

    def test_orderby_unknown_column_raises_eagerly(self, t):
        with pytest.raises(AnalysisException):
            t.orderBy("nope")


class TestIllegalAggregation:
    """``AggregationAnalysisSuite`` negative cases."""

    def test_illegal_select_field(self, t):
        """'illegal SELECT field': a non-grouped, non-aggregate
        reference in the aggregate list is rejected and the message
        names it (reference pins ``Attribute t.a`` ... ``[(t.a + 1)]``)."""
        with pytest.raises(AnalysisException) as ei:
            t.groupBy(F.col("a") + 1).agg(F.col("a").alias("naked"))
        assert "a" in _message(ei)

    def test_illegal_aggregate_in_grouping_key(self, t):
        """'illegal aggregate function in grouping key' (reference:
        "Aggregate functions are not allowed in grouping keys")."""
        with pytest.raises(AnalysisException) as ei:
            t.groupBy(F.count("a")).agg(F.count(F.lit(1)).alias("n"))
        m = _message(ei).lower()
        assert "aggregate" in m and "group" in m

    def test_illegal_having_condition(self, t):
        """'illegal HAVING condition': HAVING referencing a
        non-grouped, non-projected attribute is unresolvable in the
        post-aggregate filter — rejected, names the attribute."""
        with pytest.raises(AnalysisException) as ei:
            t.groupBy("a").having(F.col("b") > "")\
                .agg(F.count("a").alias("n"))
        assert "b" in _message(ei)

    def test_illegal_order_by_expression(self, t):
        """'illegal ORDER BY expression': same rejection for the sort
        clause of the aggregate builder."""
        with pytest.raises(AnalysisException) as ei:
            t.groupBy("a").orderBy("b").agg(F.count("a").alias("n"))
        assert "b" in _message(ei)

    def test_illegal_nested_aggregate_function(self, t):
        """'illegal nested aggregate function' (reference:
        "Aggregate function can't be nested within another aggregate
        function" for max(count(t.a)))."""
        with pytest.raises(AnalysisException) as ei:
            t.groupBy().agg(F.max(F.count("a")).alias("m"))
        m = _message(ei).lower()
        assert "nest" in m or "aggregate" in m

    def test_distinct_aggregate_is_supported_extension(self, t):
        """DIVERGENCE pin: the reference's
        ``RejectDistinctAggregateFunctions`` refuses
        ``distinct(count(a))``; Spark plans distinct aggregates
        natively (partial de-dup before the final aggregate), so the
        facade supports them as an extension (SURVEY §2.5, q21)."""
        out = t.groupBy().agg(F.countDistinct("b").alias("d")).toSeq()
        assert out[0].d == 2


class TestWindowAndPlanShape:
    """Remaining ``PostAnalysisCheckSuite`` analogs expressible at the
    facade/SQL surface."""

    def test_double_window_frame_rejected(self, spark, t):
        """A window spec with two frame clauses is a parse-time
        rejection (the reference's WindowDef redefinition check)."""
        t.asTable("t_dwf")
        with pytest.raises(Exception):
            spark.sql(
                "SELECT sum(a) OVER (ORDER BY a ROWS BETWEEN 1 "
                "PRECEDING AND CURRENT ROW ROWS BETWEEN 2 PRECEDING "
                "AND CURRENT ROW) FROM t_dwf"
            ).collect()

    def test_aggregate_of_window_function_rejected(self, t):
        """A window function inside an aggregate argument is illegal
        in both engines."""
        from pyspark.sql.window import Window as W

        with pytest.raises(AnalysisException):
            t.groupBy("a").agg(
                F.sum(F.row_number().over(W.orderBy("a"))).alias("x")
            )

    def test_star_in_scalar_context_rejected(self, spark, t):
        """``count(*)`` resolves (q21 parity) but a bare star as a
        scalar function argument is rejected at analysis."""
        t.asTable("t_star")
        with pytest.raises(AnalysisException):
            spark.sql("SELECT abs(*) FROM t_star").collect()
