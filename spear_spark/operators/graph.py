"""Iterative graph algorithms over edge DataFrames.

The reference is batch-relational only (SURVEY §2.7); together with
``dedup.connected_components`` (Kiveris large-star/small-star) this
module covers the iterative-algorithm family a curation pipeline needs
— influence/centrality scoring here, duplicate clustering there.

Scale shape: each iteration is ONE join (ranks ⋈ edges on the source
node) + ONE aggregate (contributions summed per destination) — the
textbook distributed PageRank data flow.  The edge list is cached and
re-partitioned once on the source node so every iteration reuses the
same partitioning; ranks are the only thing that moves.  Iterations
are bounded (fixed count), and per-iteration ``localCheckpoint``
truncates the lineage exactly like connected components does — without
it the plan doubles per round and the optimizer chokes at iteration
~15.

Cross-engine determinism: contributions are summed in unordered
parallel, so each iteration ends with a ROUND to ``iter_decimals``
(default 9) — both engines converge on identical rounded vectors
before FP-association noise (~1e-16/step) can amplify; the final
output rounds once more to the usual 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iters: int = 5,
    damping: float = 0.85,
    iter_decimals: int = 9,
    decimals: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list (dangling nodes
    keep their base rank; duplicate edges should be de-duplicated by
    the caller if unweighted semantics are intended).

    Returns (node, rank) with rank rounded to ``decimals``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # one partitioning for the per-iteration join, reused every round
    ej = e.join(outdeg, "src").repartition("src").localCheckpoint(eager=False)

    # F.round (HALF_UP) matches SQL ROUND on positive values; Python's
    # round() is banker's and would diverge on exact half boundaries
    base = (1.0 - damping) / n
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(float(n)), iter_decimals).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            ej.join(ranks, ej.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("cs"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("cs"), F.lit(0.0)),
                    iter_decimals,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("rank", decimals).alias("rank"))
