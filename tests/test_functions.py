"""Function-library semantics tests — the reference's expression suites
(spear-core/src/test/scala/spear/expressions/*Suite.scala) re-expressed
for the shimmed functions where spear and Spark defaults diverge."""

from pyspark.sql import functions as F

from spear_spark import functions as sf


def one(ctx, col):
    return ctx.values(col.alias("v")).collect()[0].v


class TestConcat:
    """spear Concat skips nulls (stringExpressions.scala:12-22)."""

    def test_skips_nulls(self, ctx):
        assert one(ctx, sf.concat(F.lit("a"), F.lit(None), F.lit("b"))) == "ab"

    def test_all_null(self, ctx):
        assert one(ctx, sf.concat(F.lit(None).cast("string"))) == ""


class TestArithmetic:
    def test_power(self, ctx):
        assert one(ctx, sf.power(F.lit(2), F.lit(10))) == 1024.0

    def test_integral_div(self, ctx):
        """spear Divide on integrals is integer division
        (arithmetics.scala:70-80)."""
        assert one(ctx, sf.div(F.lit(7), F.lit(2))) == 3
        assert one(ctx, sf.div(F.lit(-7), F.lit(2))) == -3  # trunc toward 0

    def test_integral_div_exact_beyond_2_53(self, ctx):
        """div must be exact over the full int64 range — the double-division
        shortcut returns 9007199254740992 for 2^53+1 (ADVICE r1)."""
        big = 9007199254740993  # 2^53 + 1, not representable as double
        assert one(ctx, sf.div(F.lit(big), F.lit(1))) == big
        imax = 9223372036854775807
        assert one(ctx, sf.div(F.lit(imax), F.lit(3))) == imax // 3
        assert one(ctx, sf.div(F.lit(-imax), F.lit(7))) == -(imax // 7)  # trunc, not floor

    def test_count_accepts_column(self, ctx):
        """count(Column) must not evaluate Column truthiness (ADVICE r1)."""
        df = ctx.lift([(None,), (1,)], "x: int")
        assert df.agg(sf.count(F.col("x")).alias("n")).collect()[0].n == 1

    def test_greatest_least_ignore_nulls(self, ctx):
        assert one(ctx, sf.greatest(F.lit(1), F.lit(None).cast("int"), F.lit(3))) == 3
        assert one(ctx, sf.least(F.lit(1), F.lit(None).cast("int"), F.lit(3))) == 1


class TestConditionals:
    def test_if(self, ctx):
        assert one(ctx, sf.if_(F.lit(True), F.lit("t"), F.lit("f"))) == "t"

    def test_case_when(self, ctx):
        c = sf.case_when((F.lit(False), F.lit(1)), (F.lit(True), F.lit(2)), else_=F.lit(3))
        assert one(ctx, c) == 2

    def test_nullif(self, ctx):
        assert one(ctx, sf.nullif(F.lit(5), F.lit(5))) is None
        assert one(ctx, sf.nullif(F.lit(5), F.lit(4))) == 5

    def test_null_safe_eq(self, ctx):
        assert one(ctx, sf.null_safe_eq(F.lit(None).cast("int"), F.lit(None).cast("int"))) is True


class TestCastShims:
    def test_to_boolean_spear_matrix(self, ctx):
        """Cast.scala:129-146 — yes/no/t/f/on/off accepted."""
        for s, expected in [
            ("yes", True), ("NO", False), ("t", True), ("f", False),
            ("on", True), ("off", False), ("1", True), ("0", False),
            ("true", True), ("false", False), ("garbage", None),
        ]:
            assert one(ctx, sf.to_boolean(F.lit(s))) is expected, s


class TestAggregates:
    def test_array_agg_keeps_nulls(self, ctx):
        """ArrayAgg keeps nulls (basic.scala:110-126); collect_list
        drops them — the shim must not."""
        df = ctx.lift([(1,), (None,), (2,)], "x: int")
        got = df.agg(sf.array_agg("x", sort=True).alias("a")).collect()[0].a
        assert got == [1, 2, None]  # nulls last per array_sort

    def test_array_agg_order_by_key(self, ctx):
        """order_by reproduces a specific arrival order deterministically
        (the reference's ArrayAgg keeps physical arrival order, which has
        no stable distributed equivalent — a key column does)."""
        df = ctx.lift(
            [(3, "c"), (1, "a"), (2, None), (4, "d")], "seq: int, x: string"
        ).df.repartition(4)
        got = df.agg(sf.array_agg("x", order_by="seq").alias("a")).collect()[0].a
        assert got == ["a", None, "c", "d"]

    def test_product_bool_and_or(self, ctx):
        df = ctx.lift([(2.0, True), (3.0, False)], "x: double, b: boolean")
        r = df.agg(
            sf.product("x").alias("p"),
            sf.bool_and("b").alias("ba"),
            sf.bool_or("b").alias("bo"),
        ).collect()[0]
        assert (r.p, r.ba, r.bo) == (6.0, False, True)

    def test_count_star_counts_nulls(self, ctx):
        df = ctx.lift([(None,), (1,)], "x: int")
        r = df.agg(sf.count("*").alias("all"), sf.count("x").alias("nn")).collect()[0]
        assert (r.all, r.nn) == (2, 1)

    def test_first_last_with_ignore_nulls(self, ctx):
        df = ctx.lift([(None,), (7,)], "x: int").df.coalesce(1)
        r = df.agg(sf.first("x", ignore_nulls=True).alias("f")).collect()[0]
        assert r.f == 7


class TestRegistry:
    def test_call_function_registered(self, ctx):
        assert one(ctx, sf.call_function("coalesce", F.lit(None).cast("int"), F.lit(9))) == 9

    def test_call_function_spark_fallback(self, ctx):
        """Unknown names dispatch to Spark's registry (the extension
        surface, FunctionRegistry.scala:66-90)."""
        assert one(ctx, sf.call_function("sqrt", F.lit(16.0))) == 4.0

    def test_register_custom(self, ctx):
        sf.register("double_it", lambda c: (F.col(c) if isinstance(c, str) else c) * 2)
        assert one(ctx, sf.call_function("double_it", F.lit(21))) == 42
