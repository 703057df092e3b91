"""One-pass per-group corpus health report — the grouped capstone of
the sketch family: per source, document counts and token-length
quantiles, total token occurrences, an HLL distinct-token estimate,
and the number of Count-Min heavy hitters, all derived from ONE corpus
scan.

A 100 TB curation run asks exactly this before touching a mixture:
"which sources are tiny / low-diversity / boilerplate-dominated /
short-doc-skewed?"  Answering it with five separate operators means
five corpus scans; here the token explode runs once into a lazily
checkpointed (group, doc_id, tok) staging, the (group, tok) exact
counts are checkpointed once more, and every downstream branch —
lengths, totals, HLL registers, the CM cell grid, the probes — reads
those bounded relations (plan-pinned: the final plan contains no
parquet scan at all; the corpus is read exactly once, inside the
staging checkpoint job).

Exactness discipline matches the rest of the sketch family (every
hash is md5-derived, the HLL estimate is `sketch._hll_est_expr`'s
integer-register form, the heavy-hitter threshold is the integer
``est * 100 >= pct * total`` comparison, quantiles are exact
percentiles rounded to 6 decimals), so the whole report is hash-exact
against a DuckDB rebuild despite containing two approximate sketches.

Reference parity: the grouped generalization of the reference's
aggregation surface (spear-core/src/main/scala/spear/expressions/
aggregates/basic.scala:12-126); the sketch columns are a north-star
extension the reference lacks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spear_spark.operators.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    HLL_M,
    _hll_est_expr,
    cm_grid_from_counts,
    cm_probe_by,
    hll_register_table_by,
)
from spear_spark.operators.text import tokens


def corpus_health_report(
    df: DataFrame,
    group_col: str,
    text_col: str,
    doc_id_col: str,
    pct: int = 1,
    qs: Sequence[float] = (0.5, 0.9),
    m: int = HLL_M,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Per-group profile: (group, n_docs, total_tokens,
    est_distinct_toks, n_heavy, q<pct>_len...), one row per group.

    - ``n_docs`` / ``q*_len``: document count and exact token-length
      quantiles (rounded to 6 decimals) from the doc-grain rollup of
      the shared token staging.
    - ``total_tokens``: token occurrences (sum of exact counts).
    - ``est_distinct_toks``: per-group HLL estimate over the DISTINCT
      token set — the (group, tok) counts table IS that set, so the
      register build reads the bounded counts, not the corpus.
    - ``n_heavy``: tokens whose per-group Count-Min estimate reaches
      ``pct`` percent of the group's occurrences (CM is linear, so the
      group-keyed sketch is summed FROM the counts; probes go through
      :func:`sketch.cm_probe_by` against the broadcast grid).  Groups
      with no heavy hitters report 0.

    Scale: after the one corpus scan, every relation is bounded —
    |docs| lengths collapse to |groups| rows map-side, the counts
    table is vocabulary-sized with bounded sketch state (|groups|·m
    registers, |groups|·d·w cells), and the final assembly joins
    |groups|-row aggregates broadcast-side."""
    toks = df.select(
        F.col(group_col), F.col(doc_id_col).alias("_doc"), F.explode(tokens(text_col)).alias("tok")
    ).localCheckpoint(eager=False)
    counts = (
        toks.groupBy(group_col, "tok")
        .agg(F.count(F.lit(1)).alias("exact"))
        .localCheckpoint(eager=False)
    )

    q_aggs = [
        F.round(F.percentile(F.col("len"), F.lit(float(q))), 6).alias(
            f"q{int(round(q * 100)):02d}_len"
        )
        for q in qs
    ]
    doc_stats = (
        toks.groupBy(group_col, "_doc")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_docs"), *q_aggs)
    )

    totals = counts.groupBy(group_col).agg(F.sum("exact").alias("total_tokens"))

    regs = hll_register_table_by(counts, group_col, F.col("tok"), m)
    hll = (
        regs.groupBy(group_col)
        .agg(
            F.coalesce(
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - max_rho)")),
                F.lit(0).cast("bigint"),
            ).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .select(
            F.col(group_col), F.round(_hll_est_expr(m), 3).alias("est_distinct_toks")
        )
    )

    grid = cm_grid_from_counts(counts, [group_col], depth=depth, width=width)
    est = cm_probe_by(
        grid, counts.select(group_col, "tok"), group_col, depth=depth, width=width
    )
    heavy = (
        est.join(F.broadcast(totals), group_col)
        .filter(F.col("est") * 100 >= F.lit(pct) * F.col("total_tokens"))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_heavy"))
    )

    qcols = [f"q{int(round(q * 100)):02d}_len" for q in qs]
    return (
        doc_stats.join(F.broadcast(totals), group_col)
        .join(F.broadcast(hll), group_col)
        .join(F.broadcast(heavy), group_col, "left")
        .select(
            F.col(group_col),
            "n_docs",
            "total_tokens",
            "est_distinct_toks",
            F.coalesce(F.col("n_heavy"), F.lit(0).cast("bigint")).alias("n_heavy"),
            *qcols,
        )
    )
