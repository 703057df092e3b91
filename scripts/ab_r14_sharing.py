"""Interleaved A/B for the round-14 pass-sharing changes:

- dedup_report's exact stage (groupBy-min + join-back, recomputed per
  consumer) vs the single min-struct aggregate behind a lazy
  localCheckpoint            -> queries p102, p137
- lsh_verified_pairs' shingle transform (computed 3x: signatures + both
  verify sides) vs the ONE checkpointed (id, shingle-array) staging
                             -> queries p29, p18, p146, p153

Alternates ORIG and NEW implementations run-by-run in ONE session
(monkeypatch on the dedup module globals), so bursty external host load
hits both variants equally.  Prints per-variant run lists, medians, and
the paired-difference median.

Usage: python scripts/ab_r14_sharing.py p102_dedup_report p29_lsh_verified_dedup [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# which module global each query's A/B must swap
PATCH_FOR = {
    "p102_dedup_report": "dedup_report",
    "p137_dedup_report_chunks": "dedup_report",
    "p29_lsh_verified_dedup": "lsh_verified_pairs",
    "p18_clean_corpus": "lsh_verified_pairs",
    "p146_cross_split_neardup": "lsh_verified_pairs",
    "p153_dedup_method_report": "lsh_verified_pairs",
}


def main() -> None:
    from pyspark.sql import functions as F

    from spear_spark.operators import dedup
    from spear_spark.context import get_spark
    from spear_spark.operators.dedup import (
        chunk_shared_pairs,
        connected_components,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        shingles,
    )

    names = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 5

    new_impl = {
        "dedup_report": dedup.dedup_report,
        "lsh_verified_pairs": dedup.lsh_verified_pairs,
    }

    def orig_dedup_report(df, text_col, id_col, group_col, threshold=0.5,
                          shingle_n=3, max_df=None, chunk_grade=False,
                          chunk_modulus=16, min_chunk_tokens=3,
                          max_chunk_df=None):
        ids = F.col(id_col)
        hashed = df.select(group_col, id_col, F.md5(F.col(text_col)).alias("_h"))
        first = hashed.groupBy("_h").agg(F.min(id_col).alias("_kid"))
        exact_kept = (hashed.join(first, "_h").filter(ids == F.col("_kid"))
                      .select(group_col, id_col))
        survivors = df.join(exact_kept.select(id_col), id_col, "semi")
        if chunk_grade:
            pairs = chunk_shared_pairs(
                survivors, text_col, id_col, modulus=chunk_modulus,
                min_tokens=min_chunk_tokens, max_chunk_df=max_chunk_df)
        else:
            pairs = ngram_jaccard_pairs(
                survivors, text_col, id_col, shingle_n=shingle_n,
                max_df=max_df).filter(F.col("jaccard") >= threshold)
        labels = connected_components(pairs)
        lab = exact_kept.join(
            labels.withColumnRenamed("doc_id", id_col), id_col, "left"
        ).withColumn("_cluster", F.coalesce(F.col("cluster_id"), ids))
        per_exact = lab.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_exact_kept"),
            F.sum((F.col("_cluster") == ids).cast("long")).alias("n_final_kept"))
        per_all = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
        return (per_all.join(per_exact, group_col, "left")
                .select(group_col, "n_docs",
                        F.coalesce("n_exact_kept", F.lit(0)).alias("n_exact_kept"),
                        F.coalesce("n_final_kept", F.lit(0)).alias("n_final_kept"),
                        F.round(F.coalesce("n_final_kept", F.lit(0)).cast("double")
                                / F.col("n_docs"), 6).alias("retention")))

    def orig_lsh_verified_pairs(df, text_col, id_col, threshold=0.5, k=12,
                                bands=4, shingle_n=3):
        cands = minhash_lsh_pairs(df, text_col, id_col, k, bands,
                                  shingle_n).select("doc_a", "doc_b")
        shs = df.select(F.col(id_col).alias("_id"),
                        shingles(text_col, shingle_n).alias("_shs"))
        a = shs.select(F.col("_id").alias("doc_a"), F.col("_shs").alias("sa"))
        b = shs.select(F.col("_id").alias("doc_b"), F.col("_shs").alias("sb"))
        return (cands.join(a, "doc_a").join(b, "doc_b")
                .withColumn("i", F.size(F.array_intersect("sa", "sb")))
                .withColumn("u", F.size("sa") + F.size("sb") - F.col("i"))
                .filter(F.col("u") > 0)
                .select("doc_a", "doc_b",
                        F.round(F.col("i").cast("double") / F.col("u"), 6)
                        .alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))

    orig_impl = {
        "dedup_report": orig_dedup_report,
        "lsh_verified_pairs": orig_lsh_verified_pairs,
    }

    spark = get_spark(
        app_name="ab_r14_sharing",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark.range(1000).count()

    def drop_persisted_rdds() -> None:
        sc = spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().valuesIterator()
        while it.hasNext():
            it.next().unpersist(True)

    for name in names:
        fn = qs[name]
        which = PATCH_FOR[name]
        runs = {"orig": [], "new": []}
        for variant, impl in (("new", new_impl[which]), ("orig", orig_impl[which])):
            setattr(dedup, which, impl)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            drop_persisted_rdds()
        for _ in range(reps):
            for variant, impl in (("orig", orig_impl[which]), ("new", new_impl[which])):
                setattr(dedup, which, impl)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs[variant].append(round(time.perf_counter() - t0, 3))
                drop_persisted_rdds()
        setattr(dedup, which, new_impl[which])
        paired = [o - n for o, n in zip(runs["orig"], runs["new"])]
        print(json.dumps({name: {
            "orig": runs["orig"],
            "new": runs["new"],
            "orig_median": statistics.median(runs["orig"]),
            "new_median": statistics.median(runs["new"]),
            "paired_diff_median": round(statistics.median(paired), 3),
        }}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
