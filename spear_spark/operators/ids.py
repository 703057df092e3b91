"""Scalable global id assignment.

``ROW_NUMBER() OVER (ORDER BY key)`` with no PARTITION BY plans as a
single-task window — the one plan shape in this repo deliberately
flagged as a 100 TB bottleneck (q16's global RANGE frame).  This module
is the fix pattern: fixed-width key buckets turn the global ordering
into (a) a tiny per-bucket count pass, (b) exact prefix offsets
computed driver-side over <= n_buckets rows (the p26 precedent: a
bounded driver fetch is fine; an unbounded one is not), and (c) a
bucket-PARTITIONED window — parallel across buckets — plus the
broadcast offset.  Output is identical to the single-task form for
unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_numbers(
    spark: SparkSession,
    df: DataFrame,
    key_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Dense contiguous 1-based ids in ``key_col`` order (keys must be
    unique integers — doc ids, event ids), equivalent to
    ``ROW_NUMBER() OVER (ORDER BY key)`` but bucket-parallel.

    Fixed-width buckets (derived from min/max, NOT sampled range
    partitioning — sampling makes boundaries nondeterministic) keep
    the assignment reproducible across runs and cluster sizes."""
    row = df.agg(
        F.min(key_col).alias("mn"), F.max(key_col).alias("mx")
    ).collect()[0]
    if row.mn is None:
        return df.select(
            F.col(key_col), F.lit(None).cast("bigint").alias("global_id")
        ).filter(F.lit(False))
    width = max(1, (int(row.mx) - int(row.mn)) // n_buckets + 1)
    bucket = ((F.col(key_col) - F.lit(int(row.mn))) / width).cast("bigint")
    counts = (
        df.select(bucket.alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    offset = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r._b):
        offsets.append((int(r._b), offset))
        offset += r._n
    off_df = spark.createDataFrame(offsets, "_b bigint, _off bigint")
    w = Window.partitionBy("_b").orderBy(key_col)
    return (
        df.withColumn("_b", bucket)
        .join(F.broadcast(off_df), "_b")
        .withColumn("global_id", F.row_number().over(w) + F.col("_off"))
        .drop("_b", "_off")
    )


def balanced_shards(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    size_col: str,
    n_shards: int = 8,
    n_buckets: int = 256,
) -> DataFrame:
    """Size-balanced shard assignment: rank rows by (size DESC, id) and
    deal them round-robin — ``shard = (rank - 1) % n_shards`` — the
    classic longest-processing-time-first approximation that keeps
    per-shard totals within one max-item of each other.  The output
    layout step training pipelines run before writing shards of
    roughly equal token budgets.

    The global size rank reuses :func:`global_row_numbers`'s
    bucket-parallel pattern via a composite integer sort key
    ``(max_size - size) * 2^33 + id`` (ascending = size DESC, id ASC)
    — no SinglePartition window.  Fixed-width buckets over the
    composite key can be population-skewed when many rows share a
    size, which degrades parallelism, never correctness.

    Bounds are ENFORCED, not assumed: ids must fit 33 bits and the
    size RANGE must fit 30 bits (so the product stays under 2^63 —
    Spark's non-ANSI bigint arithmetic would wrap silently and
    scramble the ordering).  Oversized inputs raise with guidance
    (rescale sizes — token counts, KB — or remap ids) rather than
    mis-shard silently; integral size/id types are required for the
    same reason (a float cast would truncate near-ties).
    """
    row = df.agg(
        F.max(size_col).alias("mx"),
        F.min(size_col).alias("mn"),
        F.max(id_col).alias("mx_id"),
        F.min(id_col).alias("mn_id"),
        F.sum(F.col(id_col).isNull().cast("long")).alias("null_ids"),
        F.sum(F.col(size_col).isNull().cast("long")).alias("null_sizes"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if row.n == 0:
        return df.select(
            F.col(id_col), F.col(size_col),
            F.lit(None).cast("int").alias("shard"),
        ).filter(F.lit(False))
    # NULLs would pass the min/max bounds checks (aggregates skip
    # them) and then crash opaquely inside the bucket-offset sort —
    # reject them here with the same loud-guidance contract
    if row.null_ids or row.null_sizes:
        raise ValueError(
            f"balanced_shards: {id_col}/{size_col} must be non-null "
            f"({row.null_ids} null ids, {row.null_sizes} null sizes) — "
            "filter or impute first"
        )
    for col, kind in ((id_col, "id"), (size_col, "size")):
        dt = df.schema[col].dataType.simpleString()
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"balanced_shards requires an integral {kind} column; "
                f"{col} is {dt} (cast or rescale explicitly first)"
            )
    if int(row.mn_id) < 0 or int(row.mx_id) >= (1 << 33):
        raise ValueError(
            f"balanced_shards: ids must be in [0, 2^33); got "
            f"[{row.mn_id}, {row.mx_id}] — remap ids first"
        )
    if int(row.mx) - int(row.mn) >= (1 << 30):
        raise ValueError(
            f"balanced_shards: size range {int(row.mx) - int(row.mn)} "
            f"exceeds 2^30 — rescale {size_col} (e.g. KB or token "
            "counts) so the composite rank key cannot overflow"
        )
    composite = (
        (F.lit(int(row.mx)) - F.col(size_col)).cast("bigint") * F.lit(1 << 33)
        + F.col(id_col)
    ).alias("_ck")
    keyed = df.select(F.col(id_col), F.col(size_col), composite)
    ranked = global_row_numbers(spark, keyed, "_ck", n_buckets=n_buckets)
    return ranked.select(
        id_col,
        size_col,
        ((F.col("global_id") - 1) % n_shards).cast("int").alias("shard"),
    )


def seeded_shuffle_ranks(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    group_cols: tuple[str, ...] | list[str] = (),
    seed: int = 17,
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic seeded shuffle rank, optionally per group: every
    row gets ``shuffle_key = h64(seed || '_' || id)`` (the repo's
    md5-based 60-bit uniform, reproducible in any engine) and
    ``rank`` = 1-based position of that key within its group ordered by
    ``(shuffle_key, id)``.  Equivalent to
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY shuffle_key, id)``
    but with no whole-group single-task sort: shuffle keys are uniform
    over [0, 2^60) BY CONSTRUCTION, so fixed hash-domain buckets
    (``key >> (60 - log2(n_buckets))``) split every group evenly with
    no min/max pre-pass, per-(group, bucket) counts are prefix-summed
    driver-side (bounded: |groups| x n_buckets rows), and the window
    partitions by (group, bucket) — parallel even when one group is the
    whole corpus.

    Unlike :func:`global_row_numbers` (which needs unique *integer*
    keys in their natural order), this ranks by a derived uniform hash,
    so it works for any id type and any group count, and the bucket
    histogram is balanced regardless of id distribution.
    """
    if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 60 - n_buckets.bit_length() + 1  # 60 - log2(n_buckets)
    gcols = list(group_cols)
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}_"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    base = df.select(*gcols, F.col(id_col), key.alias("_sk")).withColumn(
        "_bkt", F.shiftright(F.col("_sk"), shift)
    )
    counts = (
        base.groupBy(*gcols, "_bkt").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    from collections import defaultdict

    per_group: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for r in counts:
        per_group[tuple(r[c] for c in gcols)].append((int(r["_bkt"]), int(r["_n"])))
    rows = []
    for gkey, lst in per_group.items():
        off = 0
        for bkt, n in sorted(lst):
            rows.append((*gkey, bkt, off))
            off += n
    from pyspark.sql.types import LongType, StructField, StructType

    off_schema = StructType(
        [df.schema[c] for c in gcols]
        + [StructField("_bkt", LongType()), StructField("_off", LongType())]
    )
    off_df = spark.createDataFrame(rows, off_schema)
    w = Window.partitionBy(*gcols, "_bkt").orderBy("_sk", id_col)
    return (
        base.join(F.broadcast(off_df), gcols + ["_bkt"])
        .withColumn("rank", (F.row_number().over(w) + F.col("_off")).cast("bigint"))
        .select(*gcols, id_col, F.col("_sk").alias("shuffle_key"), "rank")
    )


def training_order(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    seed: int = 17,
    n_buckets: int = 256,
) -> DataFrame:
    """Reproducible global corpus shuffle for training runs: assign
    every document a deterministic pseudo-random ``position`` (1..n) by
    ranking the seeded md5 shuffle key globally — the same order on
    every rerun, every cluster size, every partitioning, with no
    random state and no single-task global sort.  Changing ``seed``
    yields an independent epoch order.

    This is the batch answer to "shuffle 100 TB before training,
    reproducibly": a global ORDER BY rand() is nondeterministic across
    retries (task rerun = new sample) and a row_number over it is a
    one-task window; here the key is a pure function of the id and the
    rank comes from :func:`seeded_shuffle_ranks`'s bucket-parallel
    pattern.  Readers stream packs in ``position`` order; a different
    epoch = a different seed.

    Returns ``(id, shuffle_key, position)``.
    """
    out = seeded_shuffle_ranks(
        spark, df, id_col, (), seed=seed, n_buckets=n_buckets
    )
    return out.select(id_col, "shuffle_key", F.col("rank").alias("position"))


def curriculum_order(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_stages: int = 4,
    seed: int = 23,
    n_buckets: int = 256,
) -> DataFrame:
    """Curriculum training order: rank the corpus by difficulty score
    (ascending — easy first), cut the ranking into ``n_stages``
    contiguous stages, then shuffle WITHIN each stage with the seeded
    md5 key — the standard curriculum-learning schedule (easy→hard
    stage progression, decorrelated batches inside a stage) as a pure
    function of (ids, scores, seed): rerun-stable across retries and
    cluster sizes, no random state.

    ``stage = (rank-1)·k ÷ n + 1`` over the global (score, id) rank,
    so stage sizes differ by at most one; ``position`` is the global
    1-based streaming order (stage-major, seeded-shuffle within) via
    the exact offset ``ceil((stage-1)·n/k)`` — pure int64 arithmetic,
    reproducible in any engine.  Returns ``(id, stage, position)``.

    Scale: the difficulty rank reuses :func:`balanced_shards`'
    composite-key trick ((score − min)·2³³ + id through
    :func:`global_row_numbers` — bucket-parallel, no SinglePartition
    window) with the same enforced 33-bit id / 30-bit score-range
    bounds, and the intra-stage shuffle is
    :func:`seeded_shuffle_ranks`' hash-bucketed window.  Driver state:
    two bounded collects (min/max + per-bucket counts) and the scalar
    row count — nothing proportional to the data.
    """
    if n_stages < 1:
        raise ValueError(f"curriculum_order: n_stages must be >= 1, got {n_stages}")
    row = df.agg(
        F.min(score_col).alias("mn"),
        F.max(score_col).alias("mx"),
        F.min(id_col).alias("mn_id"),
        F.max(id_col).alias("mx_id"),
        F.sum(F.col(id_col).isNull().cast("long")).alias("null_ids"),
        F.sum(F.col(score_col).isNull().cast("long")).alias("null_scores"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if row.n == 0:
        return df.select(
            F.col(id_col),
            F.lit(None).cast("int").alias("stage"),
            F.lit(None).cast("bigint").alias("position"),
        ).filter(F.lit(False))
    if row.null_ids or row.null_scores:
        raise ValueError(
            f"curriculum_order: {id_col}/{score_col} must be non-null "
            f"({row.null_ids} null ids, {row.null_scores} null scores)"
        )
    for col, kind in ((id_col, "id"), (score_col, "score")):
        dt = df.schema[col].dataType.simpleString()
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"curriculum_order requires an integral {kind} column; "
                f"{col} is {dt} (bucket or rescale the score explicitly first)"
            )
    if int(row.mn_id) < 0 or int(row.mx_id) >= (1 << 33):
        raise ValueError(
            f"curriculum_order: ids must be in [0, 2^33); got "
            f"[{row.mn_id}, {row.mx_id}] — remap ids first"
        )
    if int(row.mx) - int(row.mn) >= (1 << 30):
        raise ValueError(
            f"curriculum_order: score range {int(row.mx) - int(row.mn)} "
            f"exceeds 2^30 — rescale {score_col} first"
        )
    n = int(row.n)
    k = int(n_stages)
    composite = (
        (F.col(score_col) - F.lit(int(row.mn))).cast("bigint") * F.lit(1 << 33)
        + F.col(id_col)
    ).alias("_ck")
    ranked = global_row_numbers(
        spark, df.select(F.col(id_col), composite), "_ck", n_buckets=n_buckets
    )
    # exact int64 DIV throughout (double-division floor is off-by-one
    # past 2^53; ranks reach 1e12 at corpus scale, rank*k ~ 1e13)
    staged = ranked.select(
        id_col,
        F.expr(f"CAST((global_id - 1) * {k} DIV {n} + 1 AS INT)").alias("stage"),
    )
    shuffled = seeded_shuffle_ranks(
        spark, staged, id_col, ("stage",), seed=seed, n_buckets=n_buckets
    )
    # offset(stage) = ceil((stage-1)·n/k) = ((stage-1)·n + k - 1) DIV k
    return shuffled.select(
        F.col(id_col),
        F.col("stage"),
        (
            F.expr(f"((CAST(stage AS BIGINT) - 1) * {n} + {k} - 1) DIV {k}")
            + F.col("rank")
        ).alias("position"),
    )
