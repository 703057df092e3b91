"""In-memory 10x scale-up sanity: replicate lineitem sf0.001 ten times
with shifted keys and verify aggregation/join results scale exactly —
catches anything whose correctness quietly depends on data volume or
partition layout (run at test scale so CI stays fast; bench covers
larger volumes)."""

from pyspark.sql import functions as F

from spear_spark.sources import load_table


def test_aggregates_scale_linearly(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    li10 = li.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(10)])))
    base = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"),
    ).collect()[0]
    big = li10.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"),
    ).collect()[0]
    assert big.n == 10 * base.n
    assert big.q == 10 * base.q


def test_join_cardinality_scales(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li10 = li.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(10)])))
    base = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    big = li10.join(orders, li10.l_orderkey == orders.o_orderkey).count()
    assert big == 10 * base
