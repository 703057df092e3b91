"""Cast-semantics tests — the reference's cast matrix
(Cast.scala:26-296, CastSuite.scala) checked against Spark's coercion.
Where Spark (non-ANSI) diverges from spear, the divergence is the
documented decision and pinned here; the one semantic we actively shim
is string→boolean (functions.to_boolean, tested in test_functions)."""

from pyspark.sql import functions as F


def one(ctx, col):
    return ctx.values(col.alias("v")).collect()[0].v


class TestNumericWidening:
    """Implicit widening byte→short→int→long→float→double
    (numericTypes.scala lattice) — Catalyst does the same."""

    def test_int_plus_long_is_long(self, ctx):
        df = ctx.values(
            (F.lit(1).cast("int") + F.lit(1).cast("bigint")).alias("v")
        )
        assert df.schema["v"].dataType.simpleString() == "bigint"

    def test_int_plus_double_is_double(self, ctx):
        df = ctx.values((F.lit(1) + F.lit(0.5)).alias("v"))
        assert df.schema["v"].dataType.simpleString() == "double"


class TestStringCasts:
    def test_string_to_int(self, ctx):
        assert one(ctx, F.lit("12").cast("int")) == 12

    def test_bad_string_to_int_ansi_throws_try_cast_nulls(self, ctx):
        """Spark 4 defaults to ANSI: malformed casts throw — which
        matches spear's explicit-cast behavior (Cast.scala throws on
        bad input).  The poison-row-safe path at 100 TB is try_cast."""
        import pytest

        with pytest.raises(Exception):
            one(ctx, F.lit("abc").cast("int"))
        assert one(ctx, F.lit("abc").try_cast("int")) is None

    def test_string_to_double(self, ctx):
        assert one(ctx, F.lit("1.5").cast("double")) == 1.5

    def test_string_to_timestamp(self, ctx):
        v = one(ctx, F.lit("1998-09-02 00:00:00").cast("timestamp"))
        assert v.year == 1998 and v.month == 9

    def test_spark_boolean_cast_narrower_than_spear(self, ctx):
        """Spark accepts t/f/y/n/yes/no/true/false/0/1 for
        string→boolean but NOT on/off — the gap that functions
        .to_boolean closes (Cast.scala:129-146).  Under ANSI the
        unsupported literal throws; try_cast shows the gap as NULL."""
        assert one(ctx, F.lit("true").cast("boolean")) is True
        assert one(ctx, F.lit("on").try_cast("boolean")) is None  # Spark gap


class TestComplexCasts:
    """Recursive casts for array/map/struct (Cast.scala:166-228)."""

    def test_array_element_cast(self, ctx):
        got = one(ctx, F.array(F.lit(1), F.lit(2)).cast("array<double>"))
        assert got == [1.0, 2.0]

    def test_struct_field_cast(self, ctx):
        got = one(
            ctx,
            F.struct(F.lit(1).alias("a")).cast("struct<a: string>"),
        )
        assert got.a == "1"

    def test_map_value_cast(self, ctx):
        got = one(
            ctx,
            F.create_map(F.lit("k"), F.lit(1)).cast("map<string, double>"),
        )
        assert got == {"k": 1.0}


class TestWidestType:
    """widestTypeOf (Cast.scala:292-296): mixed branches coerce to the
    widest common type."""

    def test_coalesce_int_double(self, ctx):
        df = ctx.values(F.coalesce(F.lit(1), F.lit(2.5)).alias("v"))
        assert df.schema["v"].dataType.simpleString() == "double"

    def test_greatest_mixed(self, ctx):
        assert one(ctx, F.greatest(F.lit(1), F.lit(2.5))) == 2.5
