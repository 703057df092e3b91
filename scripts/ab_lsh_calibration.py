"""Interleaved A/B for the lsh_calibration shared-signature change:
alternate ORIG (separate minhash_lsh_pairs + minhash_signatures calls
— the signature pipeline runs twice) and NEW (one checkpointed
signature table feeding both branches) in ONE session, so bursty
external host load hits both variants equally.  Prints per-variant
run lists, medians, and the paired-difference median.
Usage: python scripts/ab_lsh_calibration.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from spear_spark.context import get_spark
    from spear_spark.operators import dedup

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    new_impl = dedup.lsh_calibration

    def orig_impl(df, text_col, id_col, k=12, bands=4, shingle_n=3, decimals=6):
        # pre-change body: candidates via minhash_lsh_pairs (which
        # computes its own signatures) + a SECOND standalone
        # minhash_signatures call for the match-count columns
        cands = dedup.minhash_lsh_pairs(
            df, text_col, id_col, k, bands, shingle_n
        ).select("doc_a", "doc_b")
        sig = dedup.minhash_signatures(df, text_col, id_col, k=k)
        siga = sig.select(
            F.col(id_col).alias("doc_a"),
            *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(k)],
        )
        sigb = sig.select(
            F.col(id_col).alias("doc_b"),
            *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(k)],
        )
        match = None
        for i in range(k):
            eq = (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("long")
            match = eq if match is None else match + eq
        shs = df.select(
            F.col(id_col).alias("_id"),
            dedup.shingles(text_col, shingle_n).alias("_shs"),
        )
        a = shs.select(F.col("_id").alias("doc_a"), F.col("_shs").alias("_sa"))
        b = shs.select(F.col("_id").alias("doc_b"), F.col("_shs").alias("_sb"))
        pairs = (
            cands.join(siga, "doc_a")
            .join(sigb, "doc_b")
            .select("doc_a", "doc_b", match.alias("n_match"))
            .join(a, "doc_a")
            .join(b, "doc_b")
            .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
            .withColumn("_u", F.size("_sa") + F.size("_sb") - F.col("_i"))
            .filter(F.col("_u") > 0)
            .select(
                "n_match",
                F.round(F.col("_i").cast("double") / F.col("_u"), 6).alias("_exact"),
            )
        )
        exm = F.round(F.col("_exact") * F.lit(1_000_000.0), 0).cast("long")
        staged = pairs.select("n_match", exm.alias("_exm"))
        kf = float(k)
        return (
            staged.groupBy("n_match")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("_exm").alias("_sem"),
                F.sum(
                    F.abs(
                        F.col("n_match") * F.lit(1_000_000) - F.lit(k) * F.col("_exm")
                    )
                ).alias("_saem"),
            )
            .select(
                "n_match",
                (
                    F.round(F.col("n_match").cast("double") / F.lit(kf), decimals)
                    + F.lit(0.0)
                ).alias("est_jaccard"),
                "n_pairs",
                (
                    F.round(
                        F.col("_sem").cast("double")
                        / (F.col("n_pairs").cast("double") * F.lit(1_000_000.0)),
                        decimals,
                    )
                    + F.lit(0.0)
                ).alias("mean_exact_jaccard"),
                (
                    F.round(
                        F.col("_saem").cast("double")
                        / (F.col("n_pairs").cast("double") * F.lit(kf * 1_000_000.0)),
                        decimals,
                    )
                    + F.lit(0.0)
                ).alias("mean_abs_err"),
            )
        )

    spark = get_spark(
        app_name="ab_lsh_calibration",
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

    fn = qs["p159_lsh_calibration"]

    # row-identity check first: both variants produce identical rows
    dedup.lsh_calibration = orig_impl
    rows_orig = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    drop_persisted_rdds()
    dedup.lsh_calibration = new_impl
    rows_new = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    drop_persisted_rdds()
    assert rows_orig == rows_new, "variants differ!"
    print(f"row-identity OK ({len(rows_new)} rows)")

    runs = {"orig": [], "new": []}
    for variant, impl in (("new", new_impl), ("orig", orig_impl)):
        dedup.lsh_calibration = impl
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        drop_persisted_rdds()
    for _ in range(reps):
        for variant, impl in (("orig", orig_impl), ("new", new_impl)):
            dedup.lsh_calibration = impl
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[variant].append(round(time.perf_counter() - t0, 3))
            drop_persisted_rdds()
    dedup.lsh_calibration = new_impl
    diffs = [o - n for o, n in zip(runs["orig"], runs["new"])]
    print("orig:", runs["orig"], "median", statistics.median(runs["orig"]))
    print("new: ", runs["new"], "median", statistics.median(runs["new"]))
    print("paired diff median (orig - new):", statistics.median(diffs))
    spark.stop()


if __name__ == "__main__":
    main()
