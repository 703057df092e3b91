"""Facade semantics tests — the spear-pinned deltas (SURVEY §2 ⚠) and
entry points, mirroring the reference's DataFrameSuite /
LocalQueryCompilerSuite (reference tests at
spear-local/src/test/scala/spear/LocalQueryCompilerSuite.scala)."""

import pytest
from pyspark.sql import functions as F

from spear_spark import functions as sf


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestContext:
    def test_range(self, ctx):
        assert rows(ctx.range(3).select("id")) == [(0,), (1,), (2,)]

    def test_range_start_end_step(self, ctx):
        assert rows(ctx.range(1, 7, 2)) == [(1,), (3,), (5,)]

    def test_lift(self, ctx):
        df = ctx.lift([(1, "a"), (2, "b")], "x: int, s: string")
        assert rows(df.orderBy("x")) == [(1, "a"), (2, "b")]

    def test_values_single_row(self, ctx):
        df = ctx.values(F.lit(1).alias("a"), F.lit("x").alias("b"))
        assert rows(df) == [(1, "x")]

    def test_sql_and_table(self, ctx):
        ctx.lift([(1,), (2,)], "x: int").asTable("t_ctx")
        assert rows(ctx.sql("SELECT sum(x) AS s FROM t_ctx")) == [(3,)]
        assert sorted(rows(ctx.table("t_ctx"))) == [(1,), (2,)]

    def test_readme_flagship_query(self, ctx):
        """The reference README query (README.md:92-99): range →
        select(key, cast(rand*100)) → filter even → sort desc."""
        df = (
            ctx.range(10)
            .select(
                F.col("id").alias("key"),
                (sf.rand(42) * 100).cast("int").alias("value"),
            )
            .where(F.col("value") % 2 == 0)
            .orderBy(F.col("value").desc())
        )
        got = rows(df)
        assert all(v % 2 == 0 for _, v in got)
        assert [v for _, v in got] == sorted([v for _, v in got], reverse=True)


class TestSetOpSemantics:
    """spear UNION is a bag, INTERSECT/EXCEPT are multiset
    (LogicalPlan.scala:241-257, basicOperators.scala:61-76)."""

    def test_union_keeps_duplicates(self, ctx):
        a = ctx.lift([(1,), (1,)], "x: int")
        assert sorted(rows(a.union(a))) == [(1,)] * 4

    def test_intersect_multiset(self, ctx):
        a = ctx.lift([(1,), (1,), (2,)], "x: int")
        b = ctx.lift([(1,), (1,), (3,)], "x: int")
        assert sorted(rows(a.intersect(b))) == [(1,), (1,)]

    def test_except_multiset(self, ctx):
        a = ctx.lift([(1,), (1,), (2,)], "x: int")
        b = ctx.lift([(1,)], "x: int")
        assert sorted(rows(a.except_(b))) == [(1,), (2,)]


class TestSortNullOrdering:
    """spear default is nulls-larger: ASC → NULLS LAST, DESC → NULLS
    FIRST (SortOrder.scala:23-31) — the opposite of Spark's default."""

    def test_asc_nulls_last(self, ctx):
        df = ctx.lift([(None,), (2,), (1,)], "x: int")
        assert rows(df.orderBy("x")) == [(1,), (2,), (None,)]

    def test_explicit_desc_nulls_first_matches_spear(self, ctx):
        df = ctx.lift([(None,), (2,), (1,)], "x: int")
        assert rows(df.orderBy(F.col("x").desc_nulls_first())) == [(None,), (2,), (1,)]


class TestGroupedBuilder:
    """Grouped(having/orderBy/agg) → Aggregate → Filter → Sort → Project
    (DataFrame.scala:199-220, aggregationAnalysis.scala:148-323)."""

    def test_having_and_order(self, ctx):
        df = ctx.lift([("a", 1), ("a", 2), ("b", 5), ("c", 1)], "k: string, v: int")
        out = (
            df.groupBy("k")
            .having(F.col("total") > 1)
            .orderBy(F.col("total").desc())
            .agg(F.sum("v").alias("total"))
        )
        assert rows(out) == [("b", 5), ("a", 3)]


class TestSelfJoin:
    """DeduplicateReferences parity (Analyzer.scala:151-209,
    LocalQueryCompilerSuite.scala:119-131): alias-disambiguated self-join."""

    def test_self_join_with_aliases(self, ctx):
        df = ctx.lift([(1, 10), (2, 10), (3, 20)], "id: int, grp: int")
        a, b = df.subquery("a"), df.subquery("b")
        out = a.join(
            b, (F.col("a.grp") == F.col("b.grp")) & (F.col("a.id") < F.col("b.id"))
        ).select(F.col("a.id").alias("l"), F.col("b.id").alias("r"))
        assert rows(out) == [(1, 2)]


class TestRename:
    def test_positional_rename(self, ctx):
        df = ctx.lift([(1, 2)], "a: int, b: int").rename("x", "y")
        assert df.columns == ["x", "y"]


class TestEagerAnalysis:
    """DataFrame.scala:12-13 — errors surface at construction, not at
    action time."""

    def test_bad_column_raises_immediately(self, ctx):
        df = ctx.lift([(1,)], "x: int")
        with pytest.raises(Exception):
            df.select("no_such_column")
