"""SQL-entry golden corpus — spear-style SQL strings through
Context.sql, compared against DuckDB on the same views (the analog of
the reference's parser corpus, DirectlyExecutableStatementParserSuite).
Every statement here is valid in BOTH engines after the dialect shim."""

import pytest
from pyspark.sql import functions as F

from spear_spark.sources import register_tables
from spear_spark.sql_dialect import to_spark_sql
from tests.oracle_harness import compare, duck_connection

CORPUS = [
    # projection + alias + arithmetic
    "SELECT n_nationkey + 100 AS k, n_name AS name FROM nation ORDER BY k",
    # filter + IN + LIKE
    "SELECT r_name FROM region WHERE r_name LIKE 'A%' OR r_name IN ('EUROPE') ORDER BY r_name",
    # group/having/order/limit, the full spear SELECT shape
    """SELECT c_nationkey AS nk, COUNT(*) AS n FROM customer
       GROUP BY c_nationkey HAVING COUNT(*) > 2 ORDER BY n DESC, nk LIMIT 5""",
    # bag UNION (spear dialect: bare UNION) — dedup would change counts
    """SELECT k, COUNT(*) AS n FROM (
         SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region
       ) t GROUP BY k ORDER BY k""",
    # join + qualified stars
    """SELECT n.n_name AS nation, r.r_name AS region FROM nation n
       JOIN region r ON n.n_regionkey = r.r_regionkey ORDER BY nation""",
    # FROM-clause subquery + alias scoping
    """SELECT t.nk, t.n FROM (SELECT s_nationkey AS nk, COUNT(*) AS n
       FROM supplier GROUP BY s_nationkey) t ORDER BY t.nk""",
    # CASE + CAST + NULLIF + COALESCE
    """SELECT n_nationkey AS k,
              CASE WHEN n_nationkey < 10 THEN 'low' ELSE 'high' END AS band,
              COALESCE(NULLIF(CAST(n_regionkey AS STRING), '0'), 'zero') AS reg
       FROM nation ORDER BY k""",
    # multi-CTE
    """WITH a AS (SELECT n_regionkey AS k, COUNT(*) AS n FROM nation GROUP BY n_regionkey),
         b AS (SELECT r_regionkey AS k, r_name FROM region)
       SELECT b.r_name AS region, a.n AS nations FROM a JOIN b ON a.k = b.k ORDER BY region""",
    # scalar functions both engines share
    """SELECT upper(r_name) AS u, CAST(length(r_name) AS INTEGER) AS l, substr(r_name, 1, 2) AS pre
       FROM region ORDER BY u""",
    # window over aggregate (spear-style)
    """SELECT c_nationkey AS nk, COUNT(*) AS n,
              CAST(SUM(COUNT(*)) OVER (ORDER BY c_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       FROM customer GROUP BY c_nationkey ORDER BY nk""",
    # nested CTEs referencing earlier CTEs
    """WITH base AS (SELECT o_custkey AS ck, COUNT(*) AS n FROM orders GROUP BY o_custkey),
         big AS (SELECT ck FROM base WHERE n >= 12)
       SELECT COUNT(*) AS n_big FROM big""",
    # EXISTS / NOT EXISTS subqueries
    """SELECT r_name FROM region r
       WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r.r_regionkey AND n_nationkey < 3)
       ORDER BY r_name""",
    # IN subquery + bag UNION combined
    """SELECT k, COUNT(*) AS n FROM (
         SELECT n_regionkey AS k FROM nation WHERE n_nationkey IN (SELECT r_regionkey FROM region)
         UNION
         SELECT r_regionkey AS k FROM region
       ) t GROUP BY k ORDER BY k""",
    # spear '^' = power: chain folds left-assoc, binds tighter than * and -
    """SELECT n_nationkey AS k, n_nationkey ^ 2 AS sq,
              2 ^ n_regionkey ^ 2 AS chain,
              3 * 2 ^ 2 AS prec, 3 - 2 ^ 2 AS binm
       FROM nation ORDER BY k""",
    # '^' over parenthesized / function-call / signed operands
    """SELECT n_nationkey AS k, (n_nationkey + 1) ^ 2 AS a,
              abs(n_regionkey) ^ 2 AS b, -2 ^ 2 AS c, 2 ^ -2 AS d
       FROM nation ORDER BY k""",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("i", range(len(CORPUS)))
def test_sql_corpus(i, ctx, spark, sf_dir, duck):
    register_tables(spark, sf_dir)
    sql = CORPUS[i]
    df = ctx.sql(sql)  # spear dialect (bag UNION)
    problems = compare(df.df, duck, to_spark_sql(sql))  # duck gets UNION ALL too
    assert not problems, f"corpus[{i}]: " + "; ".join(problems)


class TestDialect:
    def test_bare_union_becomes_bag(self):
        assert to_spark_sql("a UNION b") == "a UNION ALL b"
        assert to_spark_sql("a UNION ALL b") == "a UNION ALL b"
        assert to_spark_sql("a UNION\n ALL b") == "a UNION\n ALL b"

    def test_union_in_string_literal_untouched(self):
        assert to_spark_sql("SELECT 'UNION' AS x") == "SELECT 'UNION' AS x"

    def test_caret_rewritten_to_power(self):
        assert to_spark_sql("SELECT 2 ^ 3") == "SELECT power(2, 3)"

    def test_caret_chain_left_associative(self):
        """Reference grammar: factor = base fold '^' — left fold
        (ValueExpressionParser.scala:318-319)."""
        assert to_spark_sql("a ^ b ^ c") == "power(power(a, b), c)"

    def test_caret_binds_tighter_than_term_ops(self):
        assert to_spark_sql("2 * 3 ^ 4") == "2 * power(3, 4)"
        assert to_spark_sql("2 ^ 3 * 4") == "power(2, 3) * 4"
        assert to_spark_sql("1 + 2 ^ 3") == "1 + power(2, 3)"

    def test_caret_operand_shapes(self):
        assert to_spark_sql("(a + b) ^ 2") == "power((a + b), 2)"
        assert to_spark_sql("abs(x) ^ 2") == "power(abs(x), 2)"
        assert to_spark_sql("t.col ^ 2") == "power(t.col, 2)"
        assert to_spark_sql("2 ^ abs(x)") == "power(2, abs(x))"

    def test_caret_sign_handling(self):
        """base = sign.? ~ numericPrimary: sign after a keyword/operator
        is part of the operand; after an operand it is binary."""
        assert to_spark_sql("SELECT -2 ^ 2") == "SELECT power(-2, 2)"
        assert to_spark_sql("3 - 2 ^ 2") == "3 - power(2, 2)"
        assert to_spark_sql("2 ^ -3") == "power(2, -3)"

    def test_caret_unrecognizable_still_loud(self):
        with pytest.raises(ValueError, match="power"):
            to_spark_sql("SELECT ^ 3")

    def test_timestamp_precision_dropped(self):
        assert to_spark_sql("CAST(x AS TIMESTAMP(3))") == "CAST(x AS TIMESTAMP)"
        assert to_spark_sql("CAST(x AS TIME(3))") == "CAST(x AS TIME)"
        assert to_spark_sql("CAST(x AS TIMESTAMP(12))") == "CAST(x AS TIMESTAMP)"

    def test_double_quoted_identifier_to_backticks(self):
        assert to_spark_sql('SELECT "my col" FROM t') == "SELECT `my col` FROM t"
        # "" escape inside a delimited identifier
        assert to_spark_sql('SELECT "a""b" FROM t') == "SELECT `a\"b` FROM t"
        # rewrites must not fire inside the identifier
        assert to_spark_sql('SELECT "UNION ^" FROM t') == "SELECT `UNION ^` FROM t"

    def test_double_quoted_identifier_executes(self, ctx, spark, sf_dir):
        register_tables(spark, sf_dir)
        rows = ctx.sql('SELECT n_name AS "nation name" FROM nation ORDER BY "nation name" LIMIT 1').collect()
        assert list(rows[0].asDict()) == ["nation name"]


class TestQualifyRewrite:
    """QUALIFY (dialect extension, round 4): rewritten to the
    star-EXCEPT triple wrap; same statement runs natively on DuckDB."""

    def test_alias_predicate(self):
        out = to_spark_sql(
            "SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t QUALIFY rn = 1"
        )
        assert out == (
            "SELECT * EXCEPT (__qualify__) FROM (SELECT *, (rn = 1) AS __qualify__ "
            "FROM (SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t)) "
            "WHERE __qualify__ "
        )

    def test_direct_window_predicate_with_tail(self):
        out = to_spark_sql(
            "SELECT a, b FROM t QUALIFY row_number() OVER (PARTITION BY a ORDER BY b) <= 2 ORDER BY a LIMIT 5"
        )
        assert out.startswith("SELECT * EXCEPT (__qualify__) FROM (")
        assert out.endswith("WHERE __qualify__ ORDER BY a LIMIT 5")

    def test_cte_prefix_stays_outside(self):
        out = to_spark_sql(
            "WITH c AS (SELECT a FROM t) SELECT a, rank() OVER (ORDER BY a) AS r FROM c QUALIFY r = 1"
        )
        assert out.startswith("WITH c AS (SELECT a FROM t) SELECT * EXCEPT (__qualify__)")

    def test_subquery_qualify_untouched(self):
        # only a depth-0 QUALIFY is rewritten; quoted content never is
        sql = "SELECT 'QUALIFY rn = 1' AS s FROM t"
        assert to_spark_sql(sql) == sql

    def test_executes_both_engines(self, ctx, spark, sf_dir):
        import duckdb

        register_tables(spark, sf_dir, ("nation",))
        stmt = (
            "SELECT n_regionkey AS rk, n_name AS name, "
            "CAST(row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) AS INTEGER) AS rn "
            "FROM nation QUALIFY rn = 1 ORDER BY rk"
        )
        got = [tuple(r) for r in ctx.sql(stmt).collect()]
        import os
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW nation AS SELECT * FROM '{os.path.join(sf_dir, 'nation.parquet')}'"
        )
        want = [tuple(r) for r in con.sql(stmt).fetchall()]
        assert got == want and len(got) > 0
