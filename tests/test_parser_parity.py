"""Reference parser-corpus parity suite.

Every statement the reference's parser test suites exercise is ported
here and EXECUTED through ``Context.sql(dialect="spear")`` (the spear
dialect shim) over small lifted fixtures, then checked against DuckDB
on identical tables or against golden values the reference suite pins.
The reference only asserts the parse tree; this suite asserts the
stronger property — the statement runs and produces spear's semantics.

Sources (reference, read-only):
- ``spear-core/src/test/scala/spear/parsers/DirectlyExecutableStatementParserSuite.scala:14-281``
  (51 statements, ported 1:1 below as S-cases)
- ``spear-core/src/test/scala/spear/parsers/ValueExpressionParserSuite.scala:13-121``
  (45 expressions, E-cases, wrapped in ``SELECT <expr> AS e [FROM fixture]``)
- ``spear-core/src/test/scala/spear/parsers/DataTypeParserSuite.scala:11-59``
  (14 type spellings, Y-cases, via ``CAST(NULL AS <type>)`` schema goldens)
- ``spear-core/src/test/scala/spear/parsers/IdentifierParserSuite.scala:35-67``
  (13 legal + illegal identifier cases, I-cases)

Documented analyzer-level deltas (grammar parses; semantics differ —
see ``sql_dialect`` module docstring):
- D1: spear implicitly casts Int -> Boolean (``Cast.scala:75``), so
  ``CASE WHEN 1 THEN ...`` executes there; Spark ANSI raises
  DATATYPE_MISMATCH.  Workaround: write ``<> 0``.
- D2: spear ``/`` over integral operands truncates
  (IntegralDivide); Spark ``/`` is fractional.  SQL callers use
  ``DIV``; the E-case fixtures use DOUBLE columns so ``/`` agrees.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

from spear_spark.sql_dialect import to_spark_sql

# ---------------------------------------------------------------------------
# fixtures: tiny lifted relations mirroring the reference suite's t0/t1/t
# (duplicate (1,10) rows on both sides make the multiset INTERSECT/EXCEPT
# semantics observable)

T0 = [(1, 10), (1, 10), (2, 10), (5, 20), (11, 30), (15, 10), (20, 40)]
T1 = [(1, 10), (1, 10), (3, 30), (11, 200)]
T = [(1,), (2,)]
TB = [(True, False), (True, True), (False, False), (False, True)]
TN = [(None,), (1,), (2,)]
TE = [(2.0, 3.0, 4.0, 5.0, 6.0)]


@pytest.fixture(scope="module")
def fixtures(spark):
    spark.createDataFrame(T0, "a: long, b: long").createOrReplaceTempView("t0")
    spark.createDataFrame(T1, "a: long, c: long").createOrReplaceTempView("t1")
    spark.createDataFrame(T, "a: long").createOrReplaceTempView("t")
    spark.createDataFrame(TB, "a: boolean, b: boolean").createOrReplaceTempView("tb")
    spark.createDataFrame(TN, "a: long").createOrReplaceTempView("tn")
    spark.createDataFrame(
        TE, "a: double, b: double, c: double, d: double, e: double"
    ).createOrReplaceTempView("te")
    con = duckdb.connect()
    con.execute("CREATE TABLE t0(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", T0)
    con.execute("CREATE TABLE t1(a BIGINT, c BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?, ?)", T1)
    con.execute("CREATE TABLE t(a BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", T)
    con.execute("CREATE TABLE tb(a BOOLEAN, b BOOLEAN)")
    con.executemany("INSERT INTO tb VALUES (?, ?)", TB)
    con.execute("CREATE TABLE tn(a BIGINT)")
    con.executemany("INSERT INTO tn VALUES (?)", TN)
    con.execute("CREATE TABLE te(a DOUBLE, b DOUBLE, c DOUBLE, d DOUBLE, e DOUBLE)")
    con.executemany("INSERT INTO te VALUES (?, ?, ?, ?, ?)", TE)
    yield con
    con.close()


# ---------------------------------------------------------------------------
# comparison: engines name unaliased expressions differently, so compare
# by name when the (lower-cased) name sets agree and positionally
# otherwise; values are canonicalized (ints/floats/decimals unify, 9dp)


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int, float, decimal.Decimal)):
        f = float(v)
        if math.isnan(f):
            return ("nan",)
        return ("n", round(f, 9))
    return ("s", str(v))


def _norm_named(names, rows):
    return sorted(
        (
            tuple(sorted(((n.lower(), _canon(v)) for n, v in zip(names, r)), key=repr))
            for r in rows
        ),
        key=repr,
    )


def _norm_positional(rows):
    return sorted((tuple(_canon(v) for v in r) for r in rows), key=repr)


def run_spark(ctx, sql):
    sdf = ctx.sql(sql).df  # spear dialect shim applied inside
    return sdf.columns, [tuple(r) for r in sdf.collect()], sdf


def run_duck(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    return names, cur.fetchall()


def assert_matches(spark_out, duck_out, label):
    s_names, s_rows = spark_out
    d_names, d_rows = duck_out
    assert len(s_rows) == len(d_rows), (
        f"{label}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    if sorted(n.lower() for n in s_names) == sorted(n.lower() for n in d_names):
        assert _norm_named(s_names, s_rows) == _norm_named(d_names, d_rows), (
            f"{label}: value mismatch (named)"
        )
    else:
        assert _norm_positional(s_rows) == _norm_positional(d_rows), (
            f"{label}: value mismatch (positional; names {s_names} vs {d_names})"
        )


def duck_sql_for(sql: str) -> str:
    """Default oracle text: the shim output with backtick identifiers
    re-quoted for DuckDB (everything else the shim emits — power(),
    UNION/INTERSECT/EXCEPT ALL, merged literals, IN-list CASE, inlined
    windows, HAVING TRUE — is valid DuckDB SQL)."""
    return to_spark_sql(sql).replace("`", '"')


# ---------------------------------------------------------------------------
# S-cases: DirectlyExecutableStatementParserSuite.scala:14-281, in suite
# order.  mode: oracle (DuckDB compare, default) / count (row count only,
# for LIMIT-without-ORDER nondeterminism) — `duck` overrides the oracle
# text where DuckDB's grammar needs it (JOIN without ON).

STATEMENTS = [
    # (label, spear sql, options)
    ("s01", "SELECT 1", {}),
    ("s02", "SELECT 1 AS a FROM t0", {}),
    ("s03", "SELECT * FROM t0", {}),
    ("s04", "SELECT t0.* FROM t0", {}),
    ("s05", "SELECT a.* FROM t0 a", {}),
    ("s06", "SELECT a FROM t0 WHERE a > 10", {}),
    ("s07", "SELECT * FROM t0 ORDER BY a", {}),
    ("s08", "SELECT * FROM t0 ORDER BY a ASC", {}),
    ("s09", "SELECT * FROM t0 ORDER BY a ASC NULLS FIRST", {}),
    ("s10", "SELECT * FROM t0 ORDER BY a ASC NULLS LAST", {}),
    ("s11", "SELECT * FROM t0 ORDER BY a DESC", {}),
    ("s12", "SELECT * FROM t0 ORDER BY a DESC NULLS FIRST", {}),
    ("s13", "SELECT * FROM t0 ORDER BY a DESC NULLS LAST", {}),
    ("s14", "SELECT * FROM t0 WHERE a > 0 ORDER BY a", {}),
    ("s15", "SELECT DISTINCT a FROM t0 WHERE a > 10", {}),
    ("s16", "SELECT * FROM t0, t1", {}),
    ("s17", "SELECT 1 AS a UNION ALL SELECT 2 AS a", {}),
    ("s18", "(SELECT 1 AS a ORDER BY a) UNION ALL (SELECT 2 AS a ORDER BY a)", {}),
    (
        "s19",
        "(SELECT 1 AS a ORDER BY a LIMIT 1) UNION ALL (SELECT 2 AS a ORDER BY a LIMIT 1)",
        {},
    ),
    # spear INTERSECT/EXCEPT are multiset (basicOperators.scala:61-76):
    # the duplicated (1,10) rows must survive in both engines
    ("s20", "SELECT * FROM t0 INTERSECT SELECT * FROM t1", {}),
    ("s21", "SELECT * FROM t0 EXCEPT SELECT * FROM t1", {}),
    ("s22", "SELECT count(a) FROM t0", {}),
    ("s23", "SELECT count(a) FROM t0 GROUP BY b", {}),
    ("s24", "SELECT count(a) FROM t0 GROUP BY b HAVING count(b) > 0", {}),
    ("s25", "SELECT count(a) FROM t0 GROUP BY b ORDER BY count(b) ASC NULLS FIRST", {}),
    # aggregate-only ORDER BY -> global aggregate (one row), the
    # HAVING TRUE shim rewrite; DuckDB agrees natively
    ("s26", "SELECT 1 FROM t0 ORDER BY count(1)", {}),
    ("s27", "SELECT 1 FROM t0 ORDER BY count(a)", {}),
    ("s28", "SELECT 1 FROM t0 HAVING count(1) > 1", {}),
    ("s29", "SELECT 1 FROM t0 HAVING count(a) > 1", {}),
    ("s30", "SELECT count(DISTINCT a) FROM t0", {}),
    ("s31", "SELECT t.a FROM (SELECT * FROM t0) t", {}),
    ("s32", "WITH c0 AS (SELECT 1) SELECT * FROM c0", {}),
    ("s33", "WITH c0 (n) AS (SELECT 1) SELECT * FROM c0", {}),
    # JOIN without a condition: spear executes it as a cross product
    # (Join with condition=None); DuckDB's grammar wants CROSS JOIN
    ("s34", "SELECT * FROM t0 JOIN t1", {"duck": "SELECT * FROM t0 CROSS JOIN t1"}),
    (
        "s35",
        "SELECT * FROM t0 INNER JOIN t1",
        {"duck": "SELECT * FROM t0 CROSS JOIN t1"},
    ),
    # outer joins without a condition degenerate to the cross product
    # because the other side is never empty here
    (
        "s36",
        "SELECT * FROM t0 LEFT JOIN t1",
        {"duck": "SELECT * FROM t0 LEFT JOIN t1 ON TRUE"},
    ),
    (
        "s37",
        "SELECT * FROM t0 LEFT OUTER JOIN t1",
        {"duck": "SELECT * FROM t0 LEFT OUTER JOIN t1 ON TRUE"},
    ),
    (
        "s38",
        "SELECT * FROM t0 RIGHT OUTER JOIN t1",
        {"duck": "SELECT * FROM t0 RIGHT OUTER JOIN t1 ON TRUE"},
    ),
    (
        "s39",
        "SELECT * FROM t0 FULL JOIN t1",
        {"duck": "SELECT * FROM t0 FULL JOIN t1 ON TRUE"},
    ),
    (
        "s40",
        "SELECT * FROM t0 FULL OUTER JOIN t1",
        {"duck": "SELECT * FROM t0 FULL OUTER JOIN t1 ON TRUE"},
    ),
    ("s41", "SELECT * FROM t0 INNER JOIN t1 ON t0.a = t1.a", {}),
    (
        "s42",
        "SELECT * FROM t0 a JOIN t1 b",
        {"duck": "SELECT * FROM t0 a CROSS JOIN t1 b"},
    ),
    (
        "s43",
        "SELECT a.* FROM t0 a JOIN t1 b",
        {"duck": "SELECT a.* FROM t0 a CROSS JOIN t1 b"},
    ),
    (
        "s44",
        "WITH c0 AS (SELECT 1), c1 AS (SELECT 2) "
        "SELECT * FROM c0 UNION ALL SELECT * FROM c1",
        {},
    ),
    ("s45", "SELECT count(a) OVER () FROM t0", {}),
    ("s46", "SELECT count(a) OVER w0 FROM t0 WINDOW w0 AS ()", {}),
    # named-window inheritance, inlined by the shim
    (
        "s47",
        "SELECT count(a) OVER w1 FROM t0 "
        "WINDOW w0 AS (), w1 AS (w0 ROWS UNBOUNDED PRECEDING)",
        {},
    ),
    ("s48", "SELECT * FROM (SELECT 1 FROM t) s", {}),
    ("s49", "SELECT * FROM t0 LIMIT 1", {"count": 1}),
    ("s50", "SELECT 1 -- comment", {"duck": "SELECT 1"}),
    ("s51", "SELECT /* comment */ 1", {"duck": "SELECT 1"}),
]


@pytest.mark.parametrize("label,sql,opts", STATEMENTS, ids=[s[0] for s in STATEMENTS])
def test_statement_corpus(label, sql, opts, ctx, fixtures):
    names, rows, _ = run_spark(ctx, sql)
    if "count" in opts:
        assert len(rows) == opts["count"], f"{label}: rows {len(rows)}"
        return
    oracle = opts.get("duck") or duck_sql_for(sql)
    assert_matches((names, rows), run_duck(fixtures, oracle), label)


# a couple of the S-cases pin semantics the oracle compare (being
# order-insensitive) cannot see; pin them explicitly:


def test_s20_intersect_is_multiset(ctx, fixtures):
    """Both sides carry (1,10) twice -> multiset INTERSECT keeps 2 rows
    (Spark bare INTERSECT would keep 1)."""
    _, rows, _ = run_spark(ctx, "SELECT * FROM t0 INTERSECT SELECT * FROM t1")
    assert sorted(rows) == [(1, 10), (1, 10)]


def test_s21_except_is_multiset(ctx, fixtures):
    """t1's two (1,10) copies cancel t0's two -> 5 survivors."""
    _, rows, _ = run_spark(ctx, "SELECT * FROM t0 EXCEPT SELECT * FROM t1")
    assert sorted(rows) == [(2, 10), (5, 20), (11, 30), (15, 10), (20, 40)]


def test_s26_global_agg_one_row(ctx, fixtures):
    """spear: aggregate-only ORDER BY makes the block a global
    aggregate (AggregationAnalysisSuite.scala:64-80) -> exactly 1 row."""
    _, rows, _ = run_spark(ctx, "SELECT 1 FROM t0 ORDER BY count(1)")
    assert rows == [(1,)]


# ---------------------------------------------------------------------------
# E-cases: ValueExpressionParserSuite.scala:13-121, in suite order.
# Each expression is wrapped as SELECT <expr> AS e over the fixture its
# column references need (te = one-row DOUBLE table for arithmetic so
# '/' agrees across engines — delta D2).  golden = reference-pinned
# value(s); otherwise DuckDB oracle.

EXPRESSIONS = [
    # (label, expression, from-table or None, options)
    ("e01", "1", None, {"golden": [(1,)]}),
    ("e02", "2147483647", None, {"golden": [(2147483647,)]}),
    ("e03", "-2147483648", None, {"golden": [(-2147483648,)]}),
    ("e04", "2147483648", None, {"golden": [(2147483648,)]}),
    ("e05", "-2147483649", None, {"golden": [(-2147483649,)]}),
    ("e06", "'1'", None, {"golden": [("1",)]}),
    ("e07", "'a' || 'b' || 'c'", None, {"golden": [("abc",)]}),
    ("e08", "('a' || 'b') || 'c'", None, {"golden": [("abc",)]}),
    ("e09", "'a' || ('b' || 'c')", None, {"golden": [("abc",)]}),
    # adjacent character-string literals concatenate (SQL-2006 §5.3);
    # reference pins "'a' 'b'" -> "ab"
    ("e10", "'a' 'b'", None, {"golden": [("ab",)]}),
    ("e11", "true", None, {"golden": [(True,)]}),
    ("e12", "false", None, {"golden": [(False,)]}),
    # "a" is a delimited identifier, not a string
    ("e13", '"a"', "t0", {}),
    ("e15", "(a = 1)", "t0", {}),
    ("e16", "a AND b", "tb", {}),
    ("e17", "a OR b", "tb", {}),
    ("e18", "NOT a", "tb", {}),
    ("e19", "(a AND a) AND a", "tb", {}),
    ("e20", "a = b", "te", {}),
    ("e21", "a <> b", "te", {}),
    ("e22", "a > b", "te", {}),
    ("e23", "a >= b", "te", {}),
    ("e24", "a < b", "te", {}),
    ("e25", "a <= b", "te", {}),
    ("e26", "a IS NULL", "tn", {}),
    ("e27", "a IS NOT NULL", "tn", {}),
    ("e28", "-a", "te", {"golden": [(-2.0,)]}),
    ("e29", "a + b", "te", {"golden": [(5.0,)]}),
    ("e30", "a - b", "te", {"golden": [(-1.0,)]}),
    ("e31", "a * b", "te", {"golden": [(6.0,)]}),
    ("e32", "a / b", "te", {}),
    ("e33", "a % b", "te", {"golden": [(2.0,)]}),
    # '^' is POWER in spear (tighter than */%, left-assoc)
    ("e34", "a ^ b", "te", {"golden": [(8.0,)]}),
    ("e35", "a + b * c - d / e", "te", {}),
    ("e36", "a + b * (c - d) / e", "te", {"golden": [(1.5,)]}),
    ("e37", "a + b * c ^ d", "te", {"golden": [(3074.0,)]}),
    ("e38", "(a + b) + c", "te", {"golden": [(9.0,)]}),
    ("e39", "a + (b + c)", "te", {"golden": [(9.0,)]}),
    # rand is engine-specific; assert execution + range only
    ("e40", "CAST(RAND(42) * 100 AS INT)", None, {"check": "rand"}),
    # D1: searched CASE with Int conditions — spear coerces Int ->
    # Boolean (Cast.scala:75), Spark ANSI refuses; documented delta
    ("e41", "CASE WHEN 1 THEN 'x' WHEN 2 THEN 'y' END", None, {"delta": "D1"}),
    ("e42", "CASE WHEN 1 THEN 'x' WHEN 2 THEN 'y' ELSE 'z' END", None, {"delta": "D1"}),
    # simple CASE over te.a = 2.0
    ("e43", "CASE a WHEN 1 THEN 'x' WHEN 2 THEN 'y' END", "te", {"golden": [("y",)]}),
    (
        "e44",
        "CASE a WHEN 1 THEN 'x' WHEN 2 THEN 'y' ELSE 'z' END",
        "te",
        {"golden": [("y",)]},
    ),
    # multi-valued simple CASE (SQL-2006 §6.11) — shim rewrites to IN
    (
        "e45",
        "CASE a WHEN 1, 2 THEN 'x' WHEN 3, 4 THEN 'y' ELSE 'z' END",
        "te",
        {"golden": [("x",)]},
    ),
    ("e46", "IF(a > 0, 1, 2)", "te", {"golden": [(1,)]}),
]


@pytest.mark.parametrize(
    "label,expr,table,opts", EXPRESSIONS, ids=[e[0] for e in EXPRESSIONS]
)
def test_expression_corpus(label, expr, table, opts, ctx, fixtures):
    sql = f"SELECT {expr} AS e" + (f" FROM {table}" if table else "")
    if opts.get("delta") == "D1":
        with pytest.raises(Exception, match="DATATYPE_MISMATCH|BOOLEAN"):
            run_spark(ctx, sql)
        return
    names, rows, _ = run_spark(ctx, sql)
    assert names == ["e"]
    if opts.get("check") == "rand":
        assert len(rows) == 1 and 0 <= rows[0][0] < 100
        return
    if "golden" in opts:
        assert _norm_positional(rows) == _norm_positional(opts["golden"]), (
            f"{label}: {rows} != {opts['golden']}"
        )
        return
    assert_matches((names, rows), run_duck(fixtures, duck_sql_for(sql)), label)


def test_e14_quoted_identifier_with_escaped_quote(ctx, fixtures):
    """ValueExpressionParserSuite: "a""b" is the identifier a\"b."""
    names, rows, _ = run_spark(
        ctx, 'SELECT "a""b" AS e FROM (SELECT 1 AS "a""b") q'
    )
    assert names == ["e"] and rows == [(1,)]


def test_d2_integral_division_delta(ctx, fixtures):
    """D2: spear 7/2 = 3 (IntegralDivide); Spark '/' is fractional.
    Pin the Spark behavior so the delta stays visible and documented;
    the spear semantic is available as DIV."""
    _, rows, _ = run_spark(ctx, "SELECT CAST(7 AS INT) / CAST(2 AS INT) AS e")
    assert rows == [(3.5,)]
    _, rows, _ = run_spark(ctx, "SELECT CAST(7 AS INT) DIV CAST(2 AS INT) AS e")
    assert rows == [(3,)]


# ---------------------------------------------------------------------------
# Y-cases: DataTypeParserSuite.scala:11-59 — every type spelling must
# parse inside CAST(NULL AS <type>) and produce the expected Spark type.

DATATYPES = [
    ("y01", "BOOLEAN", "boolean"),
    ("y02", "TINYINT", "tinyint"),
    ("y03", "SMALLINT", "smallint"),
    ("y04", "INT", "int"),
    ("y05", "BIGINT", "bigint"),
    ("y06", "FLOAT", "float"),
    ("y07", "DOUBLE", "double"),
    ("y08", "ARRAY<INT>", "array<int>"),
    ("y09", "MAP<INT, STRING>", "map<int,string>"),
    ("y10", "STRUCT<name: STRING, age: INT>", "struct<name:string,age:int>"),
    ('y11', 'STRUCT<"name": STRING, "age": INT>', "struct<name:string,age:int>"),
    # ROW(...) folds unquoted names to upper case, like the reference
    # (DataTypeParserSuite.scala:45-51: ROW(name STRING) -> field NAME)
    ("y12", "ROW(name STRING, age INT)", "struct<NAME:string,AGE:int>"),
    ('y13', 'ROW("name" STRING, "age" INT)', "struct<name:string,age:int>"),
    ("y14", "ROW(a INT, b ROW(c STRING))", "struct<A:int,B:struct<C:string>>"),
]


@pytest.mark.parametrize("label,typ,want", DATATYPES, ids=[d[0] for d in DATATYPES])
def test_datatype_corpus(label, typ, want, ctx, fixtures):
    _, _, sdf = run_spark(ctx, f"SELECT CAST(NULL AS {typ}) AS e")
    assert sdf.schema["e"].dataType.simpleString() == want


# ---------------------------------------------------------------------------
# I-cases: IdentifierParserSuite.scala:35-67 — legal identifiers resolve
# to the decoded name; illegal Unicode escapes raise in the shim.

LEGAL_IDENTIFIERS = [
    ("i01", '"data"', "data"),
    ("i02", '"数据"', "数据"),
    ("i03", '"double""quote"', 'double"quote'),
    ("i04", 'U&"data"', "data"),
    ("i05", 'U&"\\6570\\636e"', "数据"),
    ("i06", 'U&"\\0064\\0061\\0074\\0061"', "data"),
    ("i07", 'U&"!!"', "!!"),
    ("i08", 'U&"\\\\"', "\\"),
    ("i09", "U&\"d!0061t!+000061\" UESCAPE '!'", "data"),
    ("i10", "U&\"!!\" UESCAPE '!'", "!"),
    ("i11", "U&\"\\\\\" UESCAPE '!'", "\\\\"),
]


@pytest.mark.parametrize(
    "label,ident,want", LEGAL_IDENTIFIERS, ids=[i[0] for i in LEGAL_IDENTIFIERS]
)
def test_identifier_corpus_legal(label, ident, want, ctx, fixtures):
    names, rows, _ = run_spark(ctx, f"SELECT 1 AS {ident}")
    assert names == [want] and rows == [(1,)]


ILLEGAL_IDENTIFIERS = [
    ("i12", "U&\"!\" UESCAPE '!'"),  # dangling escape
    ("i13", 'U&"\\"'),  # dangling default escape
]


@pytest.mark.parametrize(
    "label,ident", ILLEGAL_IDENTIFIERS, ids=[i[0] for i in ILLEGAL_IDENTIFIERS]
)
def test_identifier_corpus_illegal(label, ident, ctx):
    with pytest.raises(ValueError, match="Unicode escape"):
        to_spark_sql(f"SELECT 1 AS {ident}")
