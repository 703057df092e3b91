"""Interleaved A/B for the r15 lsh_calibration shingle staging: ORIG
(r14 — streaming-gram signatures staged; exact-verify shingle arrays
built twice) vs NEW (shs staged once, feeds signature aggregate and
both verify sides; sig staged on top).  Also checks row identity at
sf0.1.  Usage: python scripts/ab_lsh_cal_shs.py [reps]
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


def main() -> None:
    from pyspark.sql import functions as F

    from spear_spark.context import get_spark
    from spear_spark.operators import dedup
    from spear_spark.operators.dedup import (
        _lsh_pairs_from_sig,
        minhash_signatures,
        shingles,
    )

    reps = next((int(a) for a in sys.argv[1:] if a.isdigit()), 5)
    new_impl = dedup.lsh_calibration

    def orig_impl(df, text_col, id_col, k=12, bands=4, shingle_n=3, decimals=6):
        sig = minhash_signatures(df, text_col, id_col, k=k, shingle_n=shingle_n)
        sig = sig.localCheckpoint(eager=False)
        cands = _lsh_pairs_from_sig(sig, id_col, k, bands).select("doc_a", "doc_b")
        siga = sig.select(
            F.col(id_col).alias("doc_a"), *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(k)]
        )
        sigb = sig.select(
            F.col(id_col).alias("doc_b"), *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(k)]
        )
        match = None
        for i in range(k):
            eq = (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("long")
            match = eq if match is None else match + eq
        shs = df.select(
            F.col(id_col).alias("_id"), shingles(text_col, shingle_n).alias("_shs")
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
                    F.abs(F.col("n_match") * F.lit(1_000_000) - F.lit(k) * F.col("_exm"))
                ).alias("_saem"),
            )
            .select(
                "n_match",
                (F.round(F.col("n_match").cast("double") / F.lit(kf), decimals)
                 + F.lit(0.0)).alias("est_jaccard"),
                "n_pairs",
                (F.round(
                    F.col("_sem").cast("double")
                    / (F.col("n_pairs").cast("double") * F.lit(1_000_000.0)),
                    decimals,
                ) + F.lit(0.0)).alias("mean_exact_jaccard"),
                (F.round(
                    F.col("_saem").cast("double")
                    / (F.col("n_pairs").cast("double") * F.lit(kf * 1_000_000.0)),
                    decimals,
                ) + F.lit(0.0)).alias("mean_abs_err"),
            )
        )

    spark = get_spark(
        app_name="ab_lsh_cal_shs",
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

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old = orig_impl(docs, "text", "doc_id")
    new = new_impl(docs, "text", "doc_id")
    print(json.dumps({"identity": {
        "orig_rows": old.count(), "new_rows": new.count(),
        "orig_minus_new": old.exceptAll(new).count(),
        "new_minus_orig": new.exceptAll(old).count()}}), flush=True)
    drop_persisted_rdds()

    fn = qs["p159_lsh_calibration"]
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
    paired = [o - n for o, n in zip(runs["orig"], runs["new"])]
    print(json.dumps({"p159_lsh_calibration": {
        "orig": runs["orig"], "new": runs["new"],
        "orig_median": statistics.median(runs["orig"]),
        "new_median": statistics.median(runs["new"]),
        "paired_diff_median": statistics.median(paired)}}))
    spark.stop()


if __name__ == "__main__":
    main()
