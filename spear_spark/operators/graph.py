"""Iterative graph algorithms over edge DataFrames.

The reference is batch-relational only (SURVEY §2.7); together with
``dedup.connected_components`` (Kiveris large-star/small-star) this
module covers the iterative-algorithm family a curation pipeline needs
— influence/centrality scoring here, duplicate clustering there.

Scale shape: each iteration is ONE join (ranks ⋈ edges on the source
node) + ONE aggregate (contributions summed per destination) — the
textbook distributed PageRank data flow.  The edge list is checkpointed
once; in the broadcast regime the per-source mass (out-degree or weight
sum) folds into the tiny broadcast vector so the probe side is the raw
edge relation and nothing edge-sized ever moves.  Iterations are
bounded (fixed count), and per-iteration ``localCheckpoint`` truncates
the lineage for LONG chains exactly like connected components does.

Cross-engine determinism: contributions are summed in unordered
parallel, so each iteration ends with a ROUND to ``iter_decimals``
(default 9) — both engines converge on identical rounded vectors
before FP-association noise (~1e-16/step) can amplify; the final
output rounds once more to the usual 6.

Both public variants share ``_iterate`` — the bcast threshold, the
lineage-truncation policy, and the rounding discipline live in exactly
one place, so the weighted and unweighted engines cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _iterate(
    e: DataFrame,
    mul_w: bool,
    iters: int,
    damping: float,
    iter_decimals: int,
    decimals: int,
    broadcast_ranks: bool | None,
    label: str,
) -> DataFrame:
    """Shared PageRank iteration core over a CHECKPOINTED edge relation
    ``e`` with columns (src, dst[, w]).  ``mul_w``: per-edge term is
    ``(rank / mass) · w`` (weighted) vs ``rank / mass`` (unweighted,
    mass = out-degree) — association order preserved per variant so
    both stay bit-identical with their DuckDB oracles."""
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError(f"{label}: empty edge list — no nodes to rank")
    # the rank vector is one row per node — tiny next to the edge list
    # (web-scale ratios run 50-100 edges/node).  Broadcasting it turns
    # the per-iteration join into a map-side hash probe with NO edge
    # shuffle; the contribution aggregate still combines map-side.
    # Past ~5M nodes the vector outgrows executor memory — fall back
    # to the shuffle join (edges stay partitioned on src, so only the
    # rank side moves).
    bcast = n < 5_000_000 if broadcast_ranks is None else broadcast_ranks
    # per-source mass (out-degree or weight sum) is ≤ one row per node
    # — same size class as the rank vector; checkpoint it so the
    # aggregate over the full edge list doesn't re-execute every round
    mass_agg = F.sum("w") if mul_w else F.count(F.lit(1))
    out_m = (
        e.groupBy("src").agg(mass_agg.alias("m")).localCheckpoint(eager=False)
    )
    if bcast:
        # broadcast regime: fold rank/mass into the broadcast vector
        # itself, so the probe side is the RAW checkpointed edge list —
        # no (edges ⋈ mass) materialization (a full second edge copy,
        # ~1.3s at bench scale), no co-partitioning (a map-side hash
        # probe needs none)
        ej = e
    else:
        # one src partitioning for the per-iteration shuffle join,
        # reused every round — only the rank side moves
        ej = e.join(out_m, "src").repartition("src").localCheckpoint(eager=False)

    # F.round (HALF_UP) matches SQL ROUND on positive values; Python's
    # round() is banker's and would diverge on exact half boundaries
    base = (1.0 - damping) / n
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(float(n)), iter_decimals).alias("rank")
    )
    for _ in range(iters):
        if bcast:
            # rank/mass is divided ONCE per source node in the tiny
            # broadcast table instead of once per edge.  Explicit
            # aliases: from iteration 2 on, ranks' lineage already
            # contains out_m, making bare refs an ambiguous self-join.
            rd = (
                ranks.alias("_r")
                .join(
                    F.broadcast(out_m.alias("_d")),
                    F.col("_r.node") == F.col("_d.src"),
                )
                .select(
                    F.col("_d.src").alias("src"),
                    (F.col("_r.rank") / F.col("_d.m")).alias("c"),
                )
            )
            term = (F.col("c") * F.col("w")) if mul_w else F.col("c")
            edge_contrib = ej.join(F.broadcast(rd), "src").select(
                F.col("dst").alias("node"), term.alias("c")
            )
        else:
            term = (
                (F.col("rank") / F.col("m")) * F.col("w")
                if mul_w
                else F.col("rank") / F.col("m")
            )
            edge_contrib = ej.join(ranks, ej.src == ranks.node).select(
                F.col("dst").alias("node"), term.alias("c")
            )
        # shared aggregate tail — the regimes differ only in how the
        # per-edge contribution column is produced
        contribs = edge_contrib.groupBy("node").agg(F.sum("c").alias("cs"))
        ranks = (
            nodes.join(
                F.broadcast(contribs) if bcast else contribs, "node", "left"
            )
            .select(
                "node",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("cs"), F.lit(0.0)),
                    iter_decimals,
                ).alias("rank"),
            )
        )
        if iters > 8:
            # lineage truncation matters only for LONG iteration
            # chains (the CC regime); for the typical fixed 5-10
            # rounds the pipelined depth-k DAG is cheaper than k
            # serial checkpoint materializations, and it leaves no
            # cached blocks behind in long-lived sessions
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", decimals).alias("rank"))


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iters: int = 5,
    damping: float = 0.85,
    iter_decimals: int = 9,
    decimals: int = 6,
    broadcast_ranks: bool | None = None,
    edges_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list.  Dangling
    nodes keep their base rank.  Edges are de-duplicated (``distinct``
    on (src, dst)) — unweighted simple-graph semantics; multi-edge/
    weighted graphs use :func:`pagerank_weighted`.  A
    caller that can GUARANTEE (src, dst) is already duplicate-free
    passes ``edges_distinct=True`` to skip the dedup shuffle — at 100 TB
    the edge distinct is a full-corpus exchange, and upstream builds
    often get it free (e.g. a symmetrized union of a distinct bipartite
    pair set is distinct by construction; dedup narrow int keys BEFORE
    widening to string node ids — measured 3.5× on the p59 build).

    ``broadcast_ranks`` picks the per-iteration join strategy: True
    broadcasts the rank vector (map-side hash probe, zero edge
    movement), False shuffles it against the src-partitioned edges
    (the >5M-node regime where the vector outgrows executor memory),
    None (default) auto-selects on the node count.  Both paths produce
    identical rounded vectors — pinned by test_operators.

    Returns (node, rank) with rank rounded to ``decimals``.
    Raises ``ValueError`` on an empty edge list (no graph, no ranks).
    """
    # checkpoint the edge relation FIRST: it feeds nodes, the mass
    # aggregate, and the per-iteration join — without this the
    # caller's edge subtree (often a join + distinct, duplicated under
    # a symmetrize union) re-executes once per consumer (measured 3×
    # on p59's bipartite build: 13s → 4s at bench scale)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=False)
    return _iterate(
        e, False, iters, damping, iter_decimals, decimals, broadcast_ranks,
        "pagerank",
    )


def pagerank_weighted(
    edges: DataFrame,
    src: str,
    dst: str,
    weight_col: str,
    iters: int = 5,
    damping: float = 0.85,
    iter_decimals: int = 9,
    decimals: int = 6,
    broadcast_ranks: bool | None = None,
    edges_aggregated: bool = False,
) -> DataFrame:
    """Weighted PageRank: each node's rank splits across its out-edges
    ∝ edge weight — the variant :func:`pagerank` scopes out
    (SURVEY §2.7 extension; the reference is batch-relational only).  Parallel
    edges are summed into one weighted edge first, so a multigraph's
    multiplicity IS its weight; a caller whose (src, dst) is already
    unique (e.g. a symmetrized union of a grouped bipartite pair
    table, the p71 build) passes ``edges_aggregated=True`` to skip
    that full-edge exchange — the mirror of pagerank's
    ``edges_distinct``.

    Weights must be POSITIVE and are validated with one bounded job
    that runs AFTER the edge relation is checkpointed (a zero/
    negative/NaN weight sum would silently null out a source's entire
    contribution — fail loudly instead).  Ordering matters: the
    validation action is what materializes the lazy checkpoint, so the
    caller's edge-build subtree executes exactly ONCE — validating the
    raw relation first would run it twice (once for the check, again
    when the checkpoint materializes).  On the aggregating path the
    raw-edge defects are folded into the same single pass: the
    aggregate also tracks per-group null counts and the raw minimum
    weight, so a NULL hidden among positive parallel edges (F.sum
    drops NULLs) or a negative summed away by a larger positive
    sibling still fails loudly.

    Same scale shape and determinism discipline as :func:`pagerank`
    (shared ``_iterate`` core); the per-edge contribution is computed
    as ``(rank / W_src) · w`` — the division happens once per source
    in the broadcast table; the oracle mirrors this exact association
    order.

    Returns (node, rank) rounded to ``decimals``."""
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    # Explicit NaN test everywhere below: Spark ORDERS NaN greater
    # than any double, so a bare ~(w > 0) would let NaN straight
    # through (and NaN survives SUM but hides from MIN, which treats
    # it as largest — hence both columns are checked).
    msg = (
        "pagerank_weighted: edge weights must be positive (a zero/"
        "negative/NULL/NaN weight silently destroys rank mass)"
    )
    if edges_aggregated:
        # checkpoint FIRST, validate on the checkpointed relation —
        # the bounded validation job doubles as the materialization
        e = e.localCheckpoint(eager=False)
        bad_w = F.isnan("w") | F.col("w").isNull() | (F.col("w") <= 0)
        if e.filter(bad_w).limit(1).count() > 0:
            raise ValueError(msg)
    else:
        # one aggregation pass carries the defect evidence along:
        #   _nulls — raw NULLs F.sum would silently drop,
        #   _minw  — raw negatives a larger positive sibling could
        #            sum away (raw NaN poisons the SUM itself).
        e = (
            e.groupBy("src", "dst")
            .agg(
                F.sum("w").alias("w"),
                (F.count(F.lit(1)) - F.count("w")).alias("_nulls"),
                F.min("w").alias("_minw"),
            )
            .localCheckpoint(eager=False)
        )
        bad_w = (
            (F.col("_nulls") > 0)
            | F.col("w").isNull()
            | F.isnan("w")
            | (F.col("_minw") <= 0)
        )
        if e.filter(bad_w).limit(1).count() > 0:
            raise ValueError(msg)
        e = e.drop("_nulls", "_minw")
    return _iterate(
        e, True, iters, damping, iter_decimals, decimals, broadcast_ranks,
        "pagerank_weighted",
    )
