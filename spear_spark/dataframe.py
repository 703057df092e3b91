"""DataFrame facade — the reference's untyped DataFrame DSL over
``pyspark.sql.DataFrame``.

Reference parity: ``spear.DataFrame``
(``/root/reference/spear-core/src/main/scala/spear/DataFrame.scala:11-151``)
and its ``Grouped`` builder (``DataFrame.scala:199-220``).  Pinned
semantics deltas (SURVEY.md §2, flagged ⚠):

* ``union`` is a **bag** union (``LogicalPlan.scala:241-246``) →
  ``unionAll``;
* ``intersect`` / ``except`` are **multiset**
  (``basicOperators.scala:61-76``) → ``intersectAll`` / ``exceptAll``;
* sort default is *nulls-larger* (ASC → NULLS LAST, DESC → NULLS FIRST;
  ``SortOrder.scala:16-44``) — the opposite of Spark's default, so
  ``orderBy`` pins it explicitly;
* analysis is eager for early error detection (``DataFrame.scala:12-13``)
  — each facade call touches ``df.schema``, which forces Catalyst
  analysis without executing anything.

Everything below delegates to Catalyst; there is no interpreter here.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F


def _spear_sort_col(c: Any) -> Column:
    """Apply spear's nulls-larger default ordering to a bare column.

    ``isNullsFirst = isAscending ^ isNullLarger`` with ``nullsLarger``
    as the parser default (``SortOrder.scala:23-31``,
    ``QueryExpressionParser.scala:425-431``): ASC → nulls last.
    Explicitly-ordered Columns (``.desc()``, ``.asc_nulls_first()``...)
    pass through untouched.
    """
    if isinstance(c, str):
        return F.col(c).asc_nulls_last()
    return c


def _unwrap(o: Any) -> Any:
    return o.df if isinstance(o, DataFrame) else o


class DataFrame:
    """Thin immutable wrapper; ``.df`` is the underlying PySpark frame."""

    def __init__(self, df: SparkDataFrame, eager_analysis: bool = True):
        self.df = df
        if eager_analysis:
            _ = df.schema  # force Catalyst analysis (DataFrame.scala:12-13)

    # -- projection / filtering (DataFrame.scala:22-44) --------------------

    def select(self, *cols: Any) -> "DataFrame":
        return DataFrame(self.df.select(*cols))

    def filter(self, condition: Any) -> "DataFrame":
        return DataFrame(self.df.filter(condition))

    where = filter

    def limit(self, n: int) -> "DataFrame":
        return DataFrame(self.df.limit(n))

    def distinct(self) -> "DataFrame":
        """``Distinct`` (``LogicalPlan.scala:115-117``); the reference
        rewrites it to group-by-all (``aggregationAnalysis.scala:25-30``)
        — Spark's ``Deduplicate`` plans to a hash aggregate, same thing
        with map-side partial aggregation added."""
        return DataFrame(self.df.distinct())

    # -- ordering (Sort, LogicalPlan.scala:359-361) -------------------------

    def orderBy(self, *cols: Any) -> "DataFrame":
        return DataFrame(self.df.orderBy(*[_spear_sort_col(c) for c in cols]))

    sort = orderBy

    # -- joins (Join, LogicalPlan.scala:279-299) -----------------------------

    def join(self, other: "DataFrame", condition: Any = None, how: str = "inner") -> "DataFrame":
        if condition is None and how == "inner":
            return self.crossJoin(other)
        return DataFrame(self.df.join(_unwrap(other), condition, how))

    def leftJoin(self, other: "DataFrame", condition: Any = None) -> "DataFrame":
        return self.join(other, condition, "left")

    def rightJoin(self, other: "DataFrame", condition: Any = None) -> "DataFrame":
        return self.join(other, condition, "right")

    def outerJoin(self, other: "DataFrame", condition: Any = None) -> "DataFrame":
        return self.join(other, condition, "full")

    def crossJoin(self, other: "DataFrame") -> "DataFrame":
        """Bare ``JOIN`` with no condition (``JoinType`` at
        ``LogicalPlan.scala:259-277``).  The reference executes *every*
        join as a nested loop (``basicOperators.scala:78-100``); here
        Catalyst picks broadcast-hash / shuffled-hash / sort-merge, and
        theta-join conditions fall back to broadcast-nested-loop."""
        return DataFrame(self.df.crossJoin(_unwrap(other)))

    # -- set operators (SetOperator, LogicalPlan.scala:192-257) --------------

    def union(self, other: "DataFrame") -> "DataFrame":
        """Bag union — spear ``UNION`` never dedups (SURVEY §2.1 ⚠)."""
        return DataFrame(self.df.unionAll(_unwrap(other)))

    unionAll = union

    def intersect(self, other: "DataFrame") -> "DataFrame":
        """Multiset semantics (``basicOperators.scala:61-70``)."""
        return DataFrame(self.df.intersectAll(_unwrap(other)))

    def except_(self, other: "DataFrame") -> "DataFrame":
        """Multiset semantics (``basicOperators.scala:72-76``)."""
        return DataFrame(self.df.exceptAll(_unwrap(other)))

    # -- naming (Subquery / Rename) ------------------------------------------

    def subquery(self, alias: str) -> "DataFrame":
        """Scoping alias (``LogicalPlan.scala:301-306``); enables
        qualified refs + self-join disambiguation
        (``Analyzer.scala:151-209``)."""
        return DataFrame(self.df.alias(alias))

    alias = subquery

    def rename(self, *names: str) -> "DataFrame":
        """CTE-style positional rename (``LogicalPlan.scala:172-173``)."""
        return DataFrame(self.df.toDF(*names))

    def withColumn(self, name: str, col: Column) -> "DataFrame":
        return DataFrame(self.df.withColumn(name, col))

    # -- aggregation (UnresolvedAggregate builder, DataFrame.scala:199-220) --

    def groupBy(self, *keys: Any) -> "GroupedData":
        return GroupedData(self.df, list(keys))

    def agg(self, *exprs: Column) -> "DataFrame":
        """Global aggregation (``DiscoverGlobalAggregations``,
        ``aggregationAnalysis.scala:36-41``)."""
        return DataFrame(self.df.agg(*exprs))

    # -- output (DataFrame.scala:83-151) --------------------------------------

    def asTable(self, name: str) -> None:
        """Catalog registration — the reference's only sink
        (``DataFrame.scala:85-86``)."""
        self.df.createOrReplaceTempView(name)

    def toSeq(self) -> list:
        return self.df.collect()

    collect = toSeq

    def iterator(self) -> Iterator:
        return self.df.toLocalIterator()

    def show(self, n: int = 20, truncate: bool = True) -> None:
        self.df.show(n, truncate)

    def explain(self, mode: str = "formatted") -> None:
        """Matches the reference's multi-stage explain
        (``DataFrame.scala:94-121``) — Spark's formatted mode shows the
        physical plan with codegen spans and pushed filters."""
        self.df.explain(mode=mode)

    # -- passthroughs ----------------------------------------------------------

    @property
    def schema(self):
        return self.df.schema

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def to_sql(self, col: Column) -> str:
        """spear-dialect SQL text of an expression resolved against
        this frame's schema — the reference's ``Expression.sql``
        surface (``ExpressionSQLBuilderSuite.scala``); see
        :mod:`spear_spark.sql_builder` for the emission rules and the
        round-trip law."""
        from spear_spark.sql_builder import to_sql

        return to_sql(col, self.df)

    def __getitem__(self, name: str) -> Column:
        return self.df[name]

    def __getattr__(self, name: str) -> Any:
        # Fall through to the wrapped PySpark DataFrame for anything the
        # facade doesn't pin (count, cache, repartition, write, ...).
        attr = getattr(self.df, name)
        if callable(attr):
            def wrapped(*args, **kwargs):
                out = attr(*[_unwrap(a) for a in args], **kwargs)
                return DataFrame(out, eager_analysis=False) if isinstance(out, SparkDataFrame) else out

            return wrapped
        return attr


class GroupedData:
    """The reference's ``Grouped(having/orderBy/agg)`` builder
    (``DataFrame.scala:199-220``) producing ``UnresolvedAggregate``
    (``LogicalPlan.scala:336-342``).

    The reference's ``ExpandUnresolvedAggregates`` rewrite
    (``aggregationAnalysis.scala:148-323``) turns (keys, projections,
    having, order) into ``Aggregate → Filter → Sort → Project``; here
    the builder just records the clauses and emits the same shape via
    DataFrame chaining — Catalyst resolves aggregate references in
    HAVING/ORDER BY natively.
    """

    def __init__(self, df: SparkDataFrame, keys: list):
        self._df = df
        self._keys = keys
        self._having: list = []
        self._order: list = []

    def having(self, *conditions: Any) -> "GroupedData":
        self._having.extend(conditions)
        return self

    def orderBy(self, *cols: Any) -> "GroupedData":
        self._order.extend(cols)
        return self

    def agg(self, *exprs: Column) -> DataFrame:
        out = self._df.groupBy(*self._keys).agg(*exprs)
        for cond in self._having:
            out = out.filter(cond)
        if self._order:
            out = out.orderBy(*[_spear_sort_col(c) for c in self._order])
        return DataFrame(out)
