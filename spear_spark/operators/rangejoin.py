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


def interval_overlap_join(
    df_a: DataFrame,
    df_b: DataFrame,
    key: str,
    start: str,
    end: str,
    id_col: str,
    bucket_width: int,
) -> DataFrame:
    """All (id_a, id_b) pairs with ``a.key = b.key`` whose CLOSED
    intervals ``[start, end]`` overlap (``a.start <= b.end AND
    b.start <= a.end``; requires ``start <= end``).  ``start``/``end``
    are numeric (e.g. epoch microseconds).

    Scalable shape (generalizes :func:`range_join_pairs` from points to
    intervals): each interval is replicated to every
    ``bucket_width``-wide bucket it spans, candidates equi-join on
    (key, bucket), and the exact overlap predicate filters.  A true
    pair co-occurs in every bucket covered by BOTH intervals, so it is
    emitted exactly once by keeping only the bucket that contains the
    overlap's start, ``max(a.start, b.start)`` — a predicate, not a
    ``distinct``, so no extra shuffle.

    Cost at scale: one shuffle of both sides with replication factor
    ``len/bucket_width + 1`` — pick ``bucket_width`` near the typical
    interval length so replication stays ~2× while each row meets only
    candidates within one bucket of it.
    """
    B = int(bucket_width)

    def spread(df: DataFrame, suffix: str) -> DataFrame:
        bkts = F.sequence(
            F.floor(F.col(start) / B).cast("bigint"),
            F.floor(F.col(end) / B).cast("bigint"),
        )
        return df.select(
            F.col(key).alias("k"),
            F.col(id_col).alias(f"id{suffix}"),
            F.col(start).alias(f"s{suffix}"),
            F.col(end).alias(f"e{suffix}"),
            F.explode(bkts).alias("bkt"),
        )
    a = spread(df_a, "_a")
    b = spread(df_b, "_b")
    overlap_start_bkt = F.floor(F.greatest(F.col("s_a"), F.col("s_b")) / B).cast("bigint")
    return (
        a.join(b, ["k", "bkt"])
        .filter(
            (F.col("s_a") <= F.col("e_b"))
            & (F.col("s_b") <= F.col("e_a"))
            & (F.col("bkt") == overlap_start_bkt)
        )
        .select(F.col("k").alias(key), "id_a", "id_b")
    )
