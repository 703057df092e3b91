"""Window-frame semantics: spear's default frame is ROWS
UNBOUNDED PRECEDING → CURRENT ROW (WindowSpec.scala:78-102), Spark's is
RANGE when ordered — the delta shows on order-by ties (SURVEY §2.6 ⚠)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window as SparkW

from spear_spark.windows import CURRENT_ROW, UNBOUNDED_PRECEDING, Window, over


def test_default_frame_is_rows_not_range(ctx):
    # two rows tie on the order key; RANGE puts both in each other's
    # frame (running sum jumps to 3 for both), ROWS does not.
    df = ctx.lift([("a", 1, 1), ("a", 1, 2)], "k: string, o: int, v: int").df
    spear_w = Window().partitionBy("k").orderBy("o", "v").to_spark()
    got = [
        r.s
        for r in df.select(F.sum("v").over(spear_w).alias("s")).orderBy("s").collect()
    ]
    assert got == [1, 3]  # ROWS: first row sees only itself

    spark_default = SparkW.partitionBy("k").orderBy(F.lit(1))
    # (sanity: Spark's RANGE default over a constant order key puts both
    # rows in one frame)
    got_range = [
        r.s
        for r in df.select(F.sum("v").over(spark_default).alias("s")).collect()
    ]
    assert got_range == [3, 3]


def test_explicit_rows_frame(ctx):
    df = ctx.lift([(1, 10), (2, 20), (3, 30)], "o: int, v: int").df
    w = Window().orderBy("o").rowsBetween(UNBOUNDED_PRECEDING, CURRENT_ROW)
    got = [r.s for r in df.select(over(F.sum("v"), w).alias("s")).orderBy("s").collect()]
    assert got == [10, 30, 60]


def test_range_frame(ctx):
    df = ctx.lift([(1, 1), (2, 1), (10, 1)], "o: int, v: int").df
    w = Window().orderBy("o").rangeBetween(-1, 0)
    got = [
        r.s
        for r in df.select("o", over(F.sum("v"), w).alias("s")).orderBy("o").collect()
    ]
    assert got == [1, 2, 1]  # 10 is out of range of 2


def test_aggregate_over_window_spear_style(ctx):
    """Any aggregate OVER a spec (WindowFunction.scala:6-19) — no
    dedicated ranking functions needed."""
    df = ctx.lift([("a", 1), ("a", 5), ("b", 7)], "k: string, v: int").df
    w = Window().partitionBy("k")
    got = sorted(
        tuple(r)
        for r in df.select("k", "v", over(F.max("v"), w).alias("mx")).collect()
    )
    assert got == [("a", 1, 5), ("a", 5, 5), ("b", 7, 7)]


def test_partitioned_bounded_range_equals_global_window(spark):
    """The halo-row rewrite must be value-identical to the naive
    unpartitioned RANGE window — including duplicate keys (RANGE tie
    groups share frames) and keys sitting exactly on bucket edges."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as SW

    from spear_spark.windows import partitioned_bounded_range

    rnd = random.Random(17)
    # keys hug bucket boundaries (width 50) and include duplicates
    keys = [0, 1, 49, 50, 51, 99, 100, 100, 101, 149, 150, 151]
    keys += [rnd.randrange(0, 500) for _ in range(200)]
    rows = [(k, float(rnd.randrange(1, 100))) for k in keys]
    df = spark.createDataFrame(rows, "k long, v double")

    got = partitioned_bounded_range(
        df, "k", {"s": (F.col("v"), F.sum)}, preceding_range=10, bucket_width=50
    )
    naive = df.withColumn(
        "s", F.sum("v").over(SW.orderBy("k").rangeBetween(-10, SW.currentRow))
    )
    a = sorted(tuple(r) for r in got.select("k", "v", "s").collect())
    b = sorted(tuple(r) for r in naive.select("k", "v", "s").collect())
    assert a == b and len(a) == len(keys)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_width"):
        partitioned_bounded_range(
            df, "k", {"s": (F.col("v"), F.sum)}, preceding_range=50, bucket_width=50
        )


def test_partitioned_bounded_range_symmetric_equals_global_window(spark):
    """Forward-halo variant: [k-R, k+S] frames (including
    leading-only R=0) must match the naive global window on
    boundary-hugging and duplicate keys."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as SW

    from spear_spark.windows import partitioned_bounded_range

    rnd = random.Random(29)
    keys = [0, 1, 49, 50, 51, 99, 100, 100, 101, 149, 150, 151]
    keys += [rnd.randrange(0, 500) for _ in range(200)]
    rows = [(k, float(rnd.randrange(1, 100))) for k in keys]
    df = spark.createDataFrame(rows, "k long, v double")

    for R, S in [(10, 10), (0, 7), (12, 3)]:
        got = partitioned_bounded_range(
            df, "k", {"s": (F.col("v"), F.sum)},
            preceding_range=R, bucket_width=50, following_range=S,
        )
        naive = df.withColumn(
            "s", F.sum("v").over(SW.orderBy("k").rangeBetween(-R, S))
        )
        a = sorted(tuple(r) for r in got.select("k", "v", "s").collect())
        b = sorted(tuple(r) for r in naive.select("k", "v", "s").collect())
        assert a == b and len(a) == len(keys), (R, S)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_width"):
        partitioned_bounded_range(
            df, "k", {"s": (F.col("v"), F.sum)},
            preceding_range=10, bucket_width=50, following_range=50,
        )
    with _pytest.raises(ValueError, match="following_range"):
        partitioned_bounded_range(
            df, "k", {"s": (F.col("v"), F.sum)},
            preceding_range=10, bucket_width=50, following_range=-1,
        )


def test_partitioned_bounded_range_double_halo_rows(spark):
    """When preceding + following > bucket_width, a middle row can sit
    in BOTH halos (ghosts to b-1 and b+1) — still value-identical."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as SW

    from spear_spark.windows import partitioned_bounded_range

    # width 10, R=7, S=7: rows with pmod in [3,7) ghost both ways
    rows = [(k, float(k % 13 + 1)) for k in range(0, 60)] + [(25, 99.0), (25, 1.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = partitioned_bounded_range(
        df, "k", {"s": (F.col("v"), F.sum), "m": (F.col("v"), F.max)},
        preceding_range=7, bucket_width=10, following_range=7,
    )
    naive = (
        df.withColumn("s", F.sum("v").over(SW.orderBy("k").rangeBetween(-7, 7)))
        .withColumn("m", F.max("v").over(SW.orderBy("k").rangeBetween(-7, 7)))
    )
    a = sorted(tuple(r) for r in got.select("k", "v", "s", "m").collect())
    b = sorted(tuple(r) for r in naive.select("k", "v", "s", "m").collect())
    assert a == b and len(a) == len(rows)


def test_partitioned_bounded_range_on_event_time_keys(spark, sf_dir):
    """The documented event-time pattern: stage unix_micros(ts) as the
    key and express ranges in microseconds — the GLOBAL rolling
    10-minute count over events must equal the naive unpartitioned
    RANGE window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as SW

    from spear_spark.sources import load_table
    from spear_spark.windows import partitioned_bounded_range

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
    )
    ten_min = 600_000_000
    got = partitioned_bounded_range(
        ev, "us", {"n": (F.lit(1), F.count)},
        preceding_range=ten_min, bucket_width=3_600_000_000,  # 1h buckets
    )
    naive = ev.withColumn(
        "n", F.count(F.lit(1)).over(SW.orderBy("us").rangeBetween(-ten_min, 0))
    )
    a = sorted(tuple(r) for r in got.select("event_id", "us", "n").collect())
    b = sorted(tuple(r) for r in naive.select("event_id", "us", "n").collect())
    assert a == b and len(a) > 0
