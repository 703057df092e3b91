"""Custom-aggregate recipes — the PySpark analog of the reference's two
aggregate surfaces (SURVEY §2.5):

* declarative ``AggregateFunction`` (stateAttributes / initialValues /
  accumulateExpressions / mergeExpressions / resultExpression,
  ``interfaces.scala:20-54``) → **compose built-in aggregates**.  Spark
  runs the accumulate/merge split automatically (partial aggregation
  before the exchange), so a custom aggregate expressed as a formula
  over ``sum``/``count``/``min``/``max`` gets 100 TB-grade partial
  aggregation for free.  :func:`geometric_mean` shows the pattern.

* imperative ``ImperativeAggregateFunction[T]`` (object state,
  ``interfaces.scala:86-126``) → **Arrow-batched GROUPED_AGG pandas
  UDF**.  The whole group's values arrive as one pandas Series — no
  partial merge, so use it only when the computation genuinely needs
  all values (exact quantiles, order statistics) and group sizes are
  bounded.  :func:`median_udaf` shows the pattern.

Rule of thumb at scale: declarative first; a GROUPED_AGG UDAF over a
skewed key is a straggler machine.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf
# resolves real type hints, and postponed (string) annotations break it.
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def geometric_mean(c) -> Column:
    """Declarative UDAF: state = (sum of logs, count); accumulate and
    merge are the built-in ``sum``/``count`` partials; result =
    exp(sum/count).  Null inputs are skipped (spear null-skipping
    aggregate default, ``FoldLeft`` at ``interfaces.scala:128-160``)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.exp(F.sum(F.log(col)) / F.count(col))


def median_udaf():
    """Imperative UDAF: exact median via GROUPED_AGG pandas UDF.
    Usage: ``df.groupBy(k).agg(median_udaf()(F.col('x')))``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median(v: pd.Series) -> float:
        return float(v.median())

    return median


def register_builtin_udafs() -> None:
    """Expose the recipes through the engine's function registry
    (``spear_spark.functions.register``)."""
    from spear_spark import functions as sf

    sf.register("geometric_mean", geometric_mean)
