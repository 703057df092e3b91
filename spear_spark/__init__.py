"""spear_spark — a PySpark-native analytics engine with the capability
surface of liancheng/spear (SQL-2006 subset + untyped DataFrame DSL),
re-expressed Spark-first, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal).

Architecture (see SURVEY.md §7): the reference's parser / analyzer /
optimizer / executor are all replaced wholesale by Spark SQL + Catalyst
+ Tungsten. What this package provides:

* ``Context`` — the reference's ``spear.Context``
  (``/root/reference/spear-core/src/main/scala/spear/Context.scala:10-44``)
  re-expressed over ``SparkSession``: ``sql``, ``table``, ``lift``,
  ``range``, ``values``.
* ``DataFrame`` — the reference's DataFrame DSL
  (``/root/reference/spear-core/src/main/scala/spear/DataFrame.scala:11-151``)
  as a thin facade over ``pyspark.sql.DataFrame`` with spear's pinned
  semantics (bag union, multiset intersect/except, nulls-larger sort
  default, HAVING-aware groupBy builder).
* ``functions`` — the reference's function registry
  (``FunctionRegistry.scala:38-64``) with semantics shims where spear
  and Spark diverge (null-skipping ``concat``, null-keeping
  ``array_agg``, integral division, ``^`` = power).
* ``operators`` — scale-path extensions: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search,
  text analysis, multimodal column plumbing.
* ``streaming`` — Structured Streaming helpers over the events table.
* ``sql_builder`` — expression → spear-dialect SQL emission (the
  reference's ``Expression.sql`` / ``ExpressionSQLBuilderSuite``
  surface), with a reparse-equality round-trip law.
"""

from spear_spark.context import Context, get_spark
from spear_spark.dataframe import DataFrame, GroupedData
from spear_spark.windows import Window

__all__ = ["Context", "DataFrame", "GroupedData", "Window", "get_spark"]
__version__ = "0.1.0"
