"""Sequence packing: assign documents to fixed-token-budget packs for
LLM training batches.

Semantics: *offset chunking* — within a shard, documents are laid out
in key order as one continuous token stream, and a document belongs to
the pack where its first token lands (``pack_no = start_offset //
capacity``).  This is deterministic and expressible as a single window
cumulative sum, unlike first-fit bin packing, whose greedy state is
inherently sequential (per-shard ``applyInPandas`` would be the escape
hatch if exact first-fit semantics were ever required).

Scale: sharding bounds the window partition — each shard packs
independently, so the only shuffle is one hash exchange on ``shard``
and the cumulative sum never sees more than one shard per task.  At
100 TB, pick ``n_shards`` ≈ a few × cluster cores; packs stay
addressable as (shard, pack_no).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spear_spark.functions import div


def pack_sequences(
    df: DataFrame,
    tokens_col: Column | str,
    id_col: str,
    capacity: int = 1024,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, pack_no, pack_offset): shard by
    ``id % n_shards``, order by id within the shard, cumulative-sum the
    token counts, and chunk the stream every ``capacity`` tokens.
    Integer arithmetic throughout (exact ``div`` — offsets at 100 TB
    exceed 2^32 but stay well inside int64)."""
    toks = (F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col).cast("bigint")
    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return (
        df.select(F.col(id_col), shard, toks.alias("n_tokens"))
        .withColumn("_start", start)
        .select(
            id_col,
            "shard",
            "n_tokens",
            div("_start", F.lit(capacity)).alias("pack_no"),
            (F.col("_start") % capacity).alias("pack_offset"),
        )
    )
