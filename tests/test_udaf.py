"""UDAF recipe tests: declarative (partial-aggregation-friendly) and
imperative (pandas GROUPED_AGG) custom aggregates."""

import math

from pyspark.sql import functions as F

from spear_spark.functions.udaf import geometric_mean, median_udaf
from spear_spark.plans import executed_plan, has_partial_aggregation


def test_geometric_mean_value(ctx):
    df = ctx.lift([("a", 2.0), ("a", 8.0), ("b", 3.0)], "k: string, x: double").df
    got = {
        r.k: r.gm
        for r in df.groupBy("k").agg(geometric_mean("x").alias("gm")).collect()
    }
    assert math.isclose(got["a"], 4.0)
    assert math.isclose(got["b"], 3.0)


def test_geometric_mean_partial_aggregates(ctx):
    """The declarative recipe must plan as two-phase aggregation —
    that's its whole point at scale."""
    df = ctx.lift([("a", 2.0), ("b", 3.0)], "k: string, x: double").df
    plan = executed_plan(df.groupBy("k").agg(geometric_mean("x").alias("gm")))
    assert has_partial_aggregation(plan)


def test_median_udaf(ctx):
    df = ctx.lift(
        [("a", 1.0), ("a", 9.0), ("a", 2.0), ("b", 5.0)], "k: string, x: double"
    ).df
    med = median_udaf()
    got = {r.k: r.m for r in df.groupBy("k").agg(med(F.col("x")).alias("m")).collect()}
    assert got == {"a": 2.0, "b": 5.0}


def test_registry_dispatch(ctx):
    from spear_spark import functions as sf
    from spear_spark.functions.udaf import register_builtin_udafs

    register_builtin_udafs()
    df = ctx.lift([(4.0,), (16.0,)], "x: double").df
    got = df.agg(sf.call_function("geometric_mean", "x").alias("g")).collect()[0].g
    assert math.isclose(got, 8.0)
