"""Golden-row tests on the reference's own fixtures (FIXTURES.md F1-F5,
distilled from spear's physical/compiler suites) — exact expected
answers, the layer that pins reference-equivalent behavior on the
reference's own data."""

from pyspark.sql import functions as F

from spear_spark import functions as sf


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestF1SetOps:
    """r1/r2 goldens (LocalPhysicalPlanSuite.scala:133-175)."""

    def setup_method(self, m):
        self.r1 = [(1, "a"), (2, "b")]
        self.r2 = [(1, "a"), (3, "c")]

    def test_bag_union_four_rows(self, ctx):
        r1 = ctx.lift(self.r1, "a: int, b: string")
        r2 = ctx.lift(self.r2, "a: int, b: string")
        assert sorted(rows(r1.union(r2))) == [(1, "a"), (1, "a"), (2, "b"), (3, "c")]

    def test_intersect(self, ctx):
        r1 = ctx.lift(self.r1, "a: int, b: string")
        r2 = ctx.lift(self.r2, "a: int, b: string")
        assert rows(r1.intersect(r2)) == [(1, "a")]

    def test_except(self, ctx):
        r1 = ctx.lift(self.r1, "a: int, b: string")
        r2 = ctx.lift(self.r2, "a: int, b: string")
        assert rows(r1.except_(r2)) == [(2, "b")]

    def test_cartesian(self, ctx):
        r1 = ctx.lift(self.r1, "a: int, b: string")
        r2 = ctx.lift(self.r2, "a: int, b: string").rename("c", "d")
        assert r1.crossJoin(r2).count() == 4

    def test_theta_join(self, ctx):
        r1 = ctx.lift(self.r1, "a: int, b: string")
        r2 = ctx.lift(self.r2, "a: int, b: string").rename("c", "d")
        got = sorted(rows(r1.join(r2, F.col("a") < F.col("c")).select("a", "c")))
        assert got == [(1, 3), (2, 3)]


class TestF2NullOrdering:
    """Null-bearing relation goldens (LocalPhysicalPlanSuite.scala:100-131)
    under spear's nulls-larger default (SURVEY §2.4 ⚠)."""

    DATA = [(1, "a"), (3, "c"), (None, "b"), (4, None)]

    def test_spear_default_asc_nulls_last(self, ctx):
        df = ctx.lift(self.DATA, "a: int, b: string")
        assert [t[0] for t in rows(df.orderBy("a"))] == [1, 3, 4, None]

    def test_spear_default_desc_nulls_first(self, ctx):
        df = ctx.lift(self.DATA, "a: int, b: string")
        got = [t[0] for t in rows(df.orderBy(F.col("a").desc_nulls_first()))]
        assert got == [None, 4, 3, 1]

    def test_explicit_nulls_first_asc(self, ctx):
        df = ctx.lift(self.DATA, "a: int, b: string")
        got = [t[0] for t in rows(df.orderBy(F.col("a").asc_nulls_first()))]
        assert got == [None, 1, 3, 4]


class TestF3People:
    """Schema inference + SQL-over-registered-table
    (LocalQueryCompilerSuite.scala:63-83)."""

    def test_filter_and_sql(self, ctx):
        people = ctx.lift(
            [("Alice", 20), ("Bob", 21), ("Chris", 22)], "name: string, age: int"
        )
        assert rows(people.filter(F.col("age") > 20).select("name")) == [
            ("Bob",), ("Chris",),
        ]
        people.asTable("people")
        got = ctx.sql("SELECT name FROM people WHERE age < 22 ORDER BY name")
        assert rows(got) == [("Alice",), ("Bob",)]


class TestF4RangeAggregates:
    """Aggregates over range(10) with the NULL-injected derived column
    x = CASE WHEN id % 2 = 0 THEN NULL ELSE id END
    (LocalQueryCompilerSuite.scala:142-224)."""

    def _df(self, ctx):
        return ctx.range(10).withColumn(
            "x", sf.if_(F.col("id") % 2 == 0, F.lit(None).cast("bigint"), F.col("id"))
        )

    def test_aggregate_library(self, ctx):
        df = self._df(ctx)
        r = df.agg(
            sf.sum("id").alias("s"),
            sf.max("id").alias("mx"),
            sf.min("id").alias("mn"),
            sf.avg("id").alias("av"),
            sf.count("x").alias("cx"),
            sf.count("*").alias("call"),
        ).collect()[0]
        assert (r.s, r.mx, r.mn, r.av, r.cx, r.call) == (45, 9, 0, 4.5, 5, 10)

    def test_bool_aggregates(self, ctx):
        df = self._df(ctx)
        r = df.agg(
            sf.bool_and(F.col("id") >= 0).alias("ba"),
            sf.bool_or(F.col("id") > 8).alias("bo"),
        ).collect()[0]
        assert (r.ba, r.bo) == (True, True)

    def test_first_last_ignore_nulls(self, ctx):
        df = self._df(ctx).df.coalesce(1)
        r = df.agg(
            sf.first("x", ignore_nulls=True).alias("f"),
            sf.last("x", ignore_nulls=True).alias("l"),
        ).collect()[0]
        assert (r.f, r.l) == (1, 9)

    def test_array_agg_keeps_nulls(self, ctx):
        df = self._df(ctx)
        got = df.agg(sf.array_agg("x", sort=True).alias("a")).collect()[0].a
        assert got == [1, 3, 5, 7, 9, None, None, None, None, None]


class TestF5Sorting:
    """kv sorting goldens (LocalQueryCompilerSuite.scala:106-117)."""

    DATA = [("a", 3), ("b", 1), ("f", 2), ("d", 4), ("c", 5)]

    def test_sort_by_value(self, ctx):
        df = ctx.lift(self.DATA, "i: string, j: int")
        assert [t[0] for t in rows(df.orderBy("j"))] == ["b", "f", "a", "d", "c"]

    def test_sort_desc_with_limit(self, ctx):
        df = ctx.lift(self.DATA, "i: string, j: int")
        assert rows(df.orderBy(F.col("j").desc()).limit(2)) == [("c", 5), ("d", 4)]
