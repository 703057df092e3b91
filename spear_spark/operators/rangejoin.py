"""Band/range join — pairs within a time (or numeric) distance.

Spark has no native band join; the naive formulation
``a ⋈ b ON key AND |a.ts - b.ts| <= δ`` plans the temporal predicate as
a post-join residual, which is quadratic per key.  The scalable shape
used here is **bucketing**: quantize ts to δ-width buckets, replicate
one side into its neighbor bucket, equi-join on (key, bucket), then
apply the exact predicate.  Every true pair lands in the same or an
adjacent bucket, so the join is hash-based and each row meets only
~2δ worth of candidates regardless of key history length.

Cost at scale: one shuffle on (key, bucket) with 2× replication of one
side — versus the unbounded per-key blow-up of the residual-filter plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    delta_us: int,
) -> DataFrame:
    """All (a, b) pairs with ``a.key = b.key``, ``a.id < b.id`` and
    ``|ts_a - ts_b| <= delta_us``.  Returns (key, id_a, id_b)."""
    base = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        F.unix_micros(F.col(ts)).alias("t"),
    )
    bkt = F.floor(F.col("t") / delta_us).cast("bigint")
    # left side sits in its own bucket; right side is replicated into
    # (bkt-1, bkt, bkt+1).  |t-t2| <= δ implies bucket distance <= 1, so
    # every true pair meets exactly once (a is unreplicated and the
    # three replica buckets are distinct) — no dedup needed.
    a = base.select("k", "id", "t", bkt.alias("b"))
    b = base.select(
        "k",
        F.col("id").alias("id2"),
        F.col("t").alias("t2"),
        F.explode(F.array(bkt - 1, bkt, bkt + 1)).alias("b"),
    )
    joined = a.join(b, ["k", "b"]).filter(
        (F.col("id") < F.col("id2"))
        & (F.abs(F.col("t") - F.col("t2")) <= delta_us)
    )
    return joined.select(
        F.col("k").alias(key), F.col("id").alias("id_a"), F.col("id2").alias("id_b")
    )
