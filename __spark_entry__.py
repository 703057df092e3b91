"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — name → (spark, sf_dir) -> DataFrame, one per implemented
operator from SURVEY.md §2 plus the pipeline extensions.
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
non-SQL-expressible ops, which get a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _catalog() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    """Collect the full query catalog (core relational + pipeline ops)."""
    # Both modules must import — a failure here should surface loudly
    # rather than silently shrinking the query catalog.
    from spear_spark.operators.catalog import QUERIES as ops
    from spear_spark.relational import QUERIES as rel

    return {**rel, **ops}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from spear_spark.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: oracle for name, (_fn, oracle) in _catalog().items() if oracle is not None}
