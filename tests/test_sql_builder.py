"""Expression → SQL round-trip suite — the facade analog of the
reference's ``ExpressionSQLBuilderSuite.scala`` / ``SQLBuilderTest.scala``
(``spear-core/src/test/scala/spear/``): every expression the facade can
build emits spear-dialect SQL text via ``sql_builder.to_sql`` and
reparses to a value-identical expression whose re-emission is the SAME
text (fixpoint).

The reference pins exact strings with ``checkSQL(expr, "...")``; the
pinned texts below follow its conventions — ``(a + b)`` parenthesized
binary ops, ``TRUE``/``FALSE``/``NULL`` uppercase, ``CAST(x AS T)`` —
with two documented divergences:

* string escaping: the reference emits backslash escapes
  (``'\\'foo'``); this emitter doubles quotes SQL-2006-style
  (``'''foo'``) so the text survives both the spear-dialect lexer and
  Spark's backslash-escaping parser.
* ``if(a, b, c)``: the facade's ``if_`` lowers to CASE WHEN at
  construction (Spark's canonical conditional), so the emitted text is
  the CASE form.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spear_spark import functions as sf
from spear_spark.sql_builder import expression_sql, parse_expression, to_sql


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(6).select(
        (F.col("id") + 1).cast("int").alias("a"),
        (F.col("id") * 2 + 1).cast("int").alias("b"),
        (F.col("id") % 2 == 0).alias("p"),
        (F.col("id") % 3 == 0).alias("q2"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
        (F.col("id") % 3).alias("g"),
    )


def check_sql(e, expected, df):
    """``SQLBuilderTest.checkSQL`` — exact emitted text."""
    assert to_sql(e, df) == expected


def check_round_trip(e, df, order=None):
    """The round-trip law: reparse is value-identical and re-emission
    is a fixpoint."""
    text = to_sql(e, df)
    e2 = parse_expression(text, df)
    assert to_sql(e2, df) == text, f"not a fixpoint: {text!r}"
    base = df.orderBy(*(order or df.columns))
    v1 = [r[0] for r in base.select(e).collect()]
    v2 = [r[0] for r in base.select(e2).collect()]
    assert v1 == v2, f"value drift after reparse of {text!r}"
    return text


class TestPinnedTexts:
    """Mirrors the reference's pinned expectations
    (``ExpressionSQLBuilderSuite.scala`` tests 'literals', 'arithmetic
    expressions', 'logical operators', 'casting')."""

    def test_literals(self, df):
        check_sql(F.lit(None), "NULL", df)
        check_sql(F.lit(True), "TRUE", df)
        check_sql(F.lit(False), "FALSE", df)
        check_sql(F.lit("foo"), "'foo'", df)
        # reference: '\'foo' (backslash escape); here SQL-2006 doubling
        check_sql(F.lit("'foo"), "'''foo'", df)
        check_sql(F.lit(0), "0", df)
        check_sql(F.lit(4).cast("long"), "CAST(4 AS BIGINT)", df)

    def test_arithmetic_expressions(self, df):
        a, b = F.col("a"), F.col("b")
        check_sql(a + b, "(a + b)", df)
        check_sql(a - b, "(a - b)", df)
        check_sql(a * b, "(a * b)", df)
        check_sql(-a, "(- a)", df)  # reference prints (-a)
        # spear '/': integral division via the div operator (Catalyst
        # widens INT operands to BIGINT in the emitted text)
        check_sql(
            sf.div("a", "b"),
            "(CAST(a AS BIGINT) div CAST(b AS BIGINT))",
            df,
        )

    def test_logical_operators(self, df):
        p, q2 = F.col("p"), F.col("q2")
        check_sql(p & q2, "(p AND q2)", df)
        check_sql(p | q2, "(p OR q2)", df)
        check_sql(~p, "(NOT p)", df)
        # reference: if(a, b, c); facade if_ lowers to CASE WHEN
        check_sql(
            sf.if_(F.col("p"), F.col("a"), F.col("b")),
            "CASE WHEN p THEN a ELSE b END",
            df,
        )

    def test_casting(self, df):
        a = F.col("a")
        check_sql(a.cast("boolean"), "CAST(a AS BOOLEAN)", df)
        check_sql(a.cast("byte"), "CAST(a AS TINYINT)", df)
        check_sql(a.cast("short"), "CAST(a AS SMALLINT)", df)
        check_sql(a.cast("long"), "CAST(a AS BIGINT)", df)
        check_sql(a.cast("float"), "CAST(a AS FLOAT)", df)
        check_sql(a.cast("double"), "CAST(a AS DOUBLE)", df)
        check_sql(a.cast("string"), "CAST(a AS STRING)", df)
        # complex-type casts: the analyzer pushes the cast into the
        # constructor (array<bigint> cast becomes an element-level
        # implicit cast the printer elides), so the reference's
        # CAST(a AS ARRAY<INT>) pins have no preserved Spark analog —
        # the round-trip law for constructors is pinned in
        # TestRoundTrip.test_complex_constructors instead.

    def test_power_emits_spear_caret(self, df):
        """spear's '^' is POWER (``ValueExpressionParser.scala:318``)
        — the emitter prints the dialect operator, and the dialect
        parser rewrites it back."""
        text = to_sql(sf.power("a", "b"), df)
        assert text == "(CAST(a AS DOUBLE) ^ CAST(b AS DOUBLE))"

    def test_non_sql_expressions_raise(self, df):
        """Reference test 'non-SQL expressions': ``.sql.get`` throws.
        Here: bitwise XOR has no spear-SQL rendering ('^' means
        power)."""
        with pytest.raises(ValueError, match="XOR"):
            to_sql(F.col("a").bitwiseXOR(F.col("b")), df)

    def test_first_last_ignore_nulls_flag_survives(self, spark):
        """Catalyst's printer drops the ignoreNulls flag (first(a) for
        both forms) — the emitter recovers it from the tree; a dropped
        flag would change the value on null-bearing data."""
        df = spark.createDataFrame(
            [(1, None), (1, "x"), (2, None)], "g int, v string"
        )
        e = F.first("v", ignorenulls=True)
        text = expression_sql(e, df)
        assert text == "first(v, TRUE)"
        e2 = parse_expression(to_sql(e, df), df)
        got = {
            r.g: r.out
            for r in df.groupBy("g").agg(e2.alias("out")).collect()
        }
        assert got[1] == "x" and got[2] is None


class TestRoundTrip:
    """to_sql ∘ parse_expression ∘ to_sql == to_sql, and reparse is
    value-identical — over the q20/q48 expression corpus (scalar
    functions, cast matrix, complex constructors)."""

    def test_scalar_corpus(self, df):
        a, b, s = F.col("a"), F.col("b"), F.col("s")
        corpus = [
            a + b, a - b, a * b, a / b, -a, a % b,
            sf.div("a", "b"), sf.power("a", "b"),
            sf.coalesce("a", "b"), sf.nullif("a", "b"),
            sf.greatest("a", "b"), sf.least("a", "b"),
            sf.isnan(a.cast("double")),
            sf.if_(F.col("p"), a, b),
            sf.case_when((F.col("p"), a), (F.col("q2"), b), else_=F.lit(0)),
            sf.in_(a, 1, 2, 3),
            sf.null_safe_eq("a", "b"),
            sf.concat("s", "s"),
            sf.rlike("s", "s[0-9]"),
            sf.length("s"),
            sf.to_boolean(s),
            (a > b) & ~F.col("p"),
            a.between(2, 5),
            F.lit("it's"), F.lit("a\\b"), F.lit("x,y(z"),
            F.substring(s, 1, 2),
            F.upper(s), F.lower(s), F.trim(s),
            F.abs(a - b),
        ]
        for e in corpus:
            check_round_trip(e, df)

    def test_cast_corpus(self, df):
        a = F.col("a")
        for t in ("boolean", "byte", "short", "int", "long",
                  "float", "double", "string", "decimal(10,2)"):
            check_round_trip(a.cast(t), df)
        check_round_trip(F.col("s").cast("string"), df)

    def test_complex_constructors(self, df):
        corpus = [
            sf.array("a", "b"),
            F.array(F.col("a")).cast("array<bigint>"),
            sf.named_struct("x", F.col("a"), "y", F.col("b")),
            sf.map_(F.lit("k"), F.col("a")),
            F.array(F.col("a"), F.col("b"))[0],
            sf.named_struct("x", F.col("a"), "y", F.col("b"))["x"],
        ]
        for e in corpus:
            check_round_trip(e, df)

    def test_aggregates(self, df):
        corpus = [
            sf.count("*"), sf.count("a"), sf.sum("a"), sf.avg("a"),
            sf.max("a"), sf.min("a"),
            sf.bool_and("p"), sf.bool_or("p"),
            sf.first("a"), sf.last("a"),
            sf.first("a", ignore_nulls=True), sf.last("a", ignore_nulls=True),
            # NOTE: sf.product is DSL-only — Spark registers no SQL
            # routine named `product`, so its text cannot reparse; the
            # facade's registry is the parse path for it instead.
        ]
        for e in corpus:
            text = to_sql(e, df)
            e2 = parse_expression(text, df)
            assert to_sql(e2, df) == text
            v1 = df.groupBy("g").agg(e.alias("v")).orderBy("g").collect()
            v2 = df.groupBy("g").agg(e2.alias("v")).orderBy("g").collect()
            assert v1 == v2

    def test_windows(self, df):
        corpus = [
            F.sum("a").over(W.partitionBy("g").orderBy("a")),
            F.row_number().over(W.partitionBy("g").orderBy(F.desc("a"))),
            F.lag("a", 1).over(W.partitionBy("g").orderBy("a")),
            F.sum("a").over(
                W.partitionBy("g").orderBy("a")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            F.avg("a").over(
                W.partitionBy("g").orderBy("a").rangeBetween(-1, 1)
            ),
        ]
        for e in corpus:
            check_round_trip(e, df, order=["g", "a"])

    def test_window_frame_shapes(self, df):
        """The reference's ``WindowSpecSuite.scala`` frame matrix
        ('rows window frame' / 'range window frame': both-unbounded,
        n-preceding-to-current, current-to-n-following, BOTH bounds
        preceding, BOTH bounds following) plus its partition-only /
        order-only spec variants — each shape must survive the
        emit→reparse→re-emit fixpoint with identical values."""
        frames = [
            (W.unboundedPreceding, W.unboundedFollowing),
            (-10, W.currentRow),
            (W.currentRow, 10),
            (-2, -1),
            (1, 2),
        ]
        for lo, hi in frames:
            check_round_trip(
                F.sum("a").over(
                    W.partitionBy("g").orderBy("a").rowsBetween(lo, hi)
                ),
                df,
                order=["g", "a"],
            )
            check_round_trip(
                F.sum("a").over(
                    W.partitionBy("g").orderBy("a").rangeBetween(lo, hi)
                ),
                df,
                order=["g", "a"],
            )
        # spec variants: no partition / no order (WindowSpecSuite
        # 'window spec'; Spark requires ORDER BY for ranking and for
        # bounded RANGE, so the unordered variants use SUM over an
        # unbounded or ROWS frame)
        check_round_trip(F.sum("a").over(W.partitionBy("g")), df, order=["g", "a"])
        check_round_trip(
            F.sum("a").over(W.partitionBy("g").rowsBetween(-1, 1)),
            df,
            order=["g", "a"],
        )
        check_round_trip(F.sum("a").over(W.orderBy("a")), df, order=["g", "a"])

    def test_facade_to_sql_method(self, spark):
        """``DataFrame.to_sql`` — the facade surface of the emitter."""
        from spear_spark.dataframe import DataFrame as SpearDF

        sdf = SpearDF(
            spark.range(3).select(
                F.col("id").alias("a"), (F.col("id") * 2).alias("b")
            )
        )
        assert sdf.to_sql(F.col("a") + F.col("b")) == "(a + b)"

    def test_literal_escaping_survives_both_lexers(self, df):
        """The emitted literal must read back identically through the
        spear dialect shim AND Spark's backslash-escaping parser —
        quotes, backslashes, commas, parens."""
        for v in ("it's", "a\\b", "'foo", "x,y(z", "a''b", "\\'"):
            text = to_sql(F.lit(v), df)
            e2 = parse_expression(text, df)
            assert df.select(e2).first()[0] == v
