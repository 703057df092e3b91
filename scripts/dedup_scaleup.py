"""One-off scale-up timing for the banded dedup family (VERDICT r2 #8).

Replicates the sf0.1 documents table 10x in memory (5,000 -> 50,000
docs) with shifted ids and a PER-REPLICA ALPHABET ROTATION
(``translate`` with a shifted alphabet): a character bijection
preserves every replica's internal dup/near-dup structure exactly
(exact dups stay exact, Jaccard values and shingle document
frequencies are invariant), while making replicas mutually
uncorrelated — so 10x really means "10x more corpus", not "every doc
gains 9 planted near-dups".  (A first version appended one
perturbation token instead; that left replicas ~identical, cross-
replica candidates exploded quadratically in the replica count, and
p29 measured 15x at 10x — a workload change, not a scaling flaw.)

Times p05 (df-capped n-gram Jaccard), p19 (SimHash pigeonhole
near-pairs), p29 (LSH-verified near-dedup) and p134 (char-gram LSH +
Levenshtein verify) at 1x and 10x and prints the wall-time ratio per
op.  Linear-ish growth (ratio ~= 10, modulo fixed per-query overhead
which deflates the ratio at these sizes) means the banded pair spaces
are binding; a super-linear ratio would flag a quadratic stage.

Round 13 adds the embedding family (VERDICT r12 #6): p109/p122
SemDeDup timed at 1x (k=8) vs 10x (k=80 — the paper's "raise k with
the corpus" regime; a fixed k would measure the within-cell quadratic
by construction, a workload change, not a scaling flaw).  Embedding
replicas use per-replica SIGNED CYCLIC ROTATIONS (orthogonal, so each
replica's internal cosine structure is exact while cross-replica
geometry decorrelates) — the vector analog of the alphabet rotation.
Results are recorded in docs/DESIGN.md.

Run: python scripts/dedup_scaleup.py  (quiet machine; ~15 min)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spear_spark.context import get_spark
from spear_spark.operators import dedup
from spear_spark.sources import load_table

# shared with tests/test_scaleup.py so the measured corpus and the
# pinned corpus cannot drift (ADVICE r13)
from tests.scaleup_harness import (
    attach_base_column,
    replicate_docs,
    replicate_embeddings,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SCALEUP_REPS", "10"))


OPS = {
    "p05_ngram_jaccard(max_df=64)": lambda d: dedup.ngram_jaccard_pairs(
        d, "text", "doc_id", max_df=64
    ),
    "p19_simhash_near_pairs": lambda d: dedup.simhash_near_pairs(
        d, "text", "doc_id", max_hamming=3
    ),
    "p29_lsh_verified_pairs": lambda d: dedup.lsh_verified_pairs(
        d, "text", "doc_id", threshold=0.5
    ),
    "p134_edit_distance_char": lambda d: dedup.edit_distance_pairs(
        d, "text", "doc_id", max_rel=0.3, k=12, bands=4,
        candidates="char", char_n=7,
    ),
    "p90_prefix_jaccard": lambda d: dedup.jaccard_prefix_pairs(
        d, "text", "doc_id", threshold=0.5
    ),
}


def main() -> None:
    spark = get_spark(
        app_name="dedup_scaleup",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base = replicate_docs(docs, 1).localCheckpoint()  # isolate op time from scan/gen
    big = replicate_docs(docs, REPS).localCheckpoint()
    print(f"rows: base={base.count()} big={big.count()}")

    for name, op in OPS.items():
        times = {}
        for label, d in (("1x", base), (f"{REPS}x", big)):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                op(d).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            times[label] = statistics.median(runs)
        ratio = times[f"{REPS}x"] / times["1x"]
        print(
            f"{name}: 1x={times['1x']:.2f}s {REPS}x={times[f'{REPS}x']:.2f}s "
            f"ratio={ratio:.1f} ({'OK <= linear' if ratio <= REPS * 1.3 else 'SUPER-LINEAR'})"
        )

    # --- boilerplate-header skew scenario (VERDICT r9 #4) ------------
    # Plant ONE 8-token header into 50% of docs: its shingles reach
    # df = corpus/2, the df-cap's worst case.  The two-phase df-count +
    # shuffle_hash join must keep wall time ~linear in corpus size —
    # the count-over-window formulation this replaced went single-task
    # on the hot shingle (one sort of O(corpus) posting rows).
    header = "subscribe to our newsletter for daily updates now"
    hot = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit(header + " "), F.col("text"))
    ).otherwise(F.col("text"))
    base_hot = replicate_docs(docs, 1).select("doc_id", hot.alias("text")).localCheckpoint()
    big_hot = (
        replicate_docs(docs, REPS).select("doc_id", hot.alias("text")).localCheckpoint()
    )
    times = {}
    for label, d in (("1x", base_hot), (f"{REPS}x", big_hot)):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            dedup.ngram_jaccard_pairs(d, "text", "doc_id", max_df=64).write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        times[label] = statistics.median(runs)
    ratio = times[f"{REPS}x"] / times["1x"]
    print(
        f"p05_boilerplate_skew(hot df=50%, max_df=64): 1x={times['1x']:.2f}s "
        f"{REPS}x={times[f'{REPS}x']:.2f}s ratio={ratio:.1f} "
        f"({'OK <= linear' if ratio <= REPS * 1.3 else 'SUPER-LINEAR'})"
    )

    # --- report family (p102/p137/p153, VERDICT r13 #3) --------------
    # dedup_report needs the group column the replicator drops;
    # re-attach it by base id.  Invariant pins for these live in
    # tests/test_scaleup.py (exact per-source linearity for the Jaccard
    # grade, zero cross-replica chunk pairs, per-grade laws for the
    # method report); this section measures the wall-time ratio.
    docs_src = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    base_src = attach_base_column(
        replicate_docs(docs, 1), docs_src, "source"
    ).localCheckpoint()
    big_src = attach_base_column(
        replicate_docs(docs, REPS), docs_src, "source"
    ).localCheckpoint()
    report_ops = {
        "p102_dedup_report": lambda d: dedup.dedup_report(
            d, "text", "doc_id", "source", threshold=0.5
        ),
        "p137_dedup_report_chunks": lambda d: dedup.dedup_report(
            d, "text", "doc_id", "source",
            chunk_grade=True, chunk_modulus=16, min_chunk_tokens=3,
        ),
        "p153_dedup_method_report": lambda d: dedup.dedup_method_report(
            d, "text", "doc_id"
        ),
    }
    for name, op in report_ops.items():
        times = {}
        for label, d in (("1x", base_src), (f"{REPS}x", big_src)):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                op(d).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            times[label] = statistics.median(runs)
        ratio = times[f"{REPS}x"] / times["1x"]
        print(
            f"{name}: 1x={times['1x']:.2f}s {REPS}x={times[f'{REPS}x']:.2f}s "
            f"ratio={ratio:.1f} ({'OK <= linear' if ratio <= REPS * 1.3 else 'SUPER-LINEAR'})"
        )

    # --- SemDeDup family (p109 full fit / p122 sampled fit) ----------
    # k scales with the corpus (8 -> 8*REPS), the published regime;
    # fit corpora: p109 fits on the full input, p122 on the even-id
    # half (the catalog's sampled-fit shape).
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    emb1 = replicate_embeddings(emb, 1).localCheckpoint()
    embN = replicate_embeddings(emb, REPS).localCheckpoint()
    print(f"embedding rows: base={emb1.count()} big={embN.count()}")
    for name, fit in (
        ("p109_semdedup(full fit)", lambda d: None),
        ("p122_semdedup(sampled fit)", lambda d: d.filter(F.col("vec_id") % 2 == 0)),
    ):
        times = {}
        for label, d, k in (("1x", emb1, 8), (f"{REPS}x", embN, 8 * REPS)):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                dedup.semdedup(
                    d, "embedding", "vec_id", k=k, threshold=0.35,
                    tol=0.3, max_iters=50, fit_on=fit(d),
                ).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            times[label] = statistics.median(runs)
        ratio = times[f"{REPS}x"] / times["1x"]
        print(
            f"{name}: 1x(k=8)={times['1x']:.2f}s "
            f"{REPS}x(k={8 * REPS})={times[f'{REPS}x']:.2f}s ratio={ratio:.1f} "
            f"({'OK <= linear' if ratio <= REPS * 1.3 else 'SUPER-LINEAR'})"
        )
    # --- graph + leakage-split families (p59/p131/p135) --------------
    # Structural pins (per-copy rank invariance, leak-free-at-10x,
    # audit sensitivity counts) live in tests/test_scaleup.py; this
    # section measures the wall-time ratio.  PageRank replicates the
    # bipartite graph as 10 DISJOINT copies (suffixed node ids) — the
    # per-iteration join/aggregate must scale with the edge count, not
    # couple across components.
    from spear_spark.operators import graph
    from spear_spark.operators.sampling import leakage_safe_split

    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    pset = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pset.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pset.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    e1 = edges.localCheckpoint()
    eN = (
        edges.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(REPS)]))
        )
        .select(
            F.concat_ws("_", "src", F.col("rep").cast("string")).alias("src"),
            F.concat_ws("_", "dst", F.col("rep").cast("string")).alias("dst"),
        )
        .localCheckpoint()
    )
    print(f"edge rows: base={e1.count()} big={eN.count()}")
    verb1 = replicate_docs(docs, 1).localCheckpoint()
    verbN = (
        docs.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(REPS)]))
        )
        .select((F.col("doc_id") * 16 + F.col("rep")).alias("doc_id"), "text")
        .localCheckpoint()
    )
    fam_ops = (
        (
            "p59_pagerank(5 iters)",
            lambda d: graph.pagerank(d, "src", "dst", iters=5, edges_distinct=True),
            (e1, eN),
        ),
        (
            "p135_leakage_safe_split(content key)",
            lambda d: leakage_safe_split(d, "text", "doc_id", val_frac=0.3),
            (verb1, verbN),
        ),
        (
            "p131_split_leakage(exact audit)",
            lambda d: dedup.split_leakage_report(
                d, "text", "doc_id", F.col("doc_id") % 2 == 1
            ),
            (verb1, verbN),
        ),
    )
    for name, op, (d1, dN) in fam_ops:
        times = {}
        for label, d in (("1x", d1), (f"{REPS}x", dN)):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                op(d).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            times[label] = statistics.median(runs)
        ratio = times[f"{REPS}x"] / times["1x"]
        print(
            f"{name}: 1x={times['1x']:.2f}s {REPS}x={times[f'{REPS}x']:.2f}s "
            f"ratio={ratio:.1f} ({'OK <= linear' if ratio <= REPS * 1.3 else 'SUPER-LINEAR'})"
        )
    # --- k-center family (p114/p121) ---------------------------------
    # Structural pin (bit-identical selection under verbatim 10x
    # duplication) lives in tests/test_scaleup.py; this measures the
    # wall-time ratio.  Both are <= linear by construction: the direct
    # traversal is k-1 full-corpus projection+argmax passes, the 2-pass
    # form is Lloyd's per-round corpus aggregate + a bounded pass 2.
    from spear_spark.operators.similarity import (
        kcenter_coreset,
        kcenter_coreset_2pass,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    emb1 = emb.localCheckpoint()
    embN = (
        emb.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(REPS)]))
        )
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint()
    )
    kc_ops = (
        (
            "p114_kcenter_coreset(k=6)",
            lambda d: kcenter_coreset(d, "embedding", "vec_id", k=6),
        ),
        (
            "p121_kcenter_2pass(k=4, 8 cells)",
            lambda d: kcenter_coreset_2pass(
                d, "embedding", "vec_id", k=4, n_cells=8, tol=0.3, max_iters=10
            ),
        ),
    )
    for name, op in kc_ops:
        times = {}
        for label, d in (("1x", emb1), (f"{REPS}x", embN)):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                op(d).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            times[label] = statistics.median(runs)
        ratio = times[f"{REPS}x"] / times["1x"]
        print(
            f"{name}: 1x={times['1x']:.2f}s {REPS}x={times[f'{REPS}x']:.2f}s "
            f"ratio={ratio:.1f} ({'OK <= linear' if ratio <= REPS * 1.3 else 'SUPER-LINEAR'})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
