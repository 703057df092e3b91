"""Interleaved A/B + row-identity for the r15 p90 rewrite: prefix
candidates via posting-list pair Generates (ONE prefix-pipeline pass)
vs the pre-r15 pref ⋈ pref self-join (pipeline evaluated on both
sides; ReuseExchange never fired).  Usage:
python scripts/ab_p90_postings.py [reps] [--identity]
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
    from pyspark.sql.window import Window as W

    from spear_spark.context import get_spark
    from spear_spark.operators import dedup
    from spear_spark.operators.dedup import _widen_narrow_scan, shingles

    reps = next((int(a) for a in sys.argv[1:] if a.isdigit()), 5)
    identity = "--identity" in sys.argv

    new_impl = dedup.jaccard_prefix_pairs

    def orig_impl(df, text_col, id_col, threshold=0.5, shingle_n=3):
        df = _widen_narrow_scan(df)
        base = (
            df.select(F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("shs"))
            .filter(F.size("shs") > 0)
            .localCheckpoint(eager=False)
        )
        post = base.select(
            F.col("id"), F.size("shs").alias("n"), F.explode("shs").alias("s")
        )
        dfc = post.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        ranked = post.join(dfc.hint("shuffle_hash"), "s")
        ranked = ranked.withColumn(
            "rk", F.row_number().over(W.partitionBy("id").orderBy("df", "s"))
        )
        plen = F.col("n") - F.ceil(F.lit(float(threshold)) * F.col("n")) + 2
        pref = ranked.filter(F.col("rk") <= F.least(plen, F.col("n"))).select(
            "id", "n", "s", "rk"
        )
        t = float(threshold)
        ub = (
            F.lit(1)
            + F.least(F.col("a.n") - F.col("a.rk"), F.col("b.n") - F.col("b.rk"))
            + F.lit(1)
        )
        cand = (
            pref.alias("a")
            .join(
                pref.alias("b"),
                (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")),
            )
            .filter(
                (F.col("a.n") * t <= F.col("b.n") + 1e-9)
                & (F.col("b.n") * t <= F.col("a.n") + 1e-9)
                & (
                    ub.cast("double") * (1.0 + t)
                    >= t * (F.col("a.n") + F.col("b.n")) - 1e-9
                )
            )
            .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
            .distinct()
        )
        av = base.select(F.col("id").alias("doc_a"), F.col("shs").alias("_sa"))
        bv = base.select(F.col("id").alias("doc_b"), F.col("shs").alias("_sb"))
        i = F.size(F.array_intersect("_sa", "_sb"))
        na, nb = F.size("_sa"), F.size("_sb")
        return (
            cand.join(av, "doc_a")
            .join(bv, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.round(i.cast("double") / (na + nb - i), 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= F.lit(float(threshold)))
        )

    spark = get_spark(
        app_name="ab_p90",
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

    if identity:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        a = orig_impl(docs, "text", "doc_id", threshold=0.5)
        b = new_impl(docs, "text", "doc_id", threshold=0.5)
        d1 = a.exceptAll(b).count()
        d2 = b.exceptAll(a).count()
        print(json.dumps({"identity": {"orig_rows": a.count(), "new_rows": b.count(),
                                       "orig_minus_new": d1, "new_minus_orig": d2}}))
        drop_persisted_rdds()

    fn = qs["p90_prefix_jaccard"]
    runs = {"orig": [], "new": []}
    for variant, impl in (("new", new_impl), ("orig", orig_impl)):
        dedup.jaccard_prefix_pairs = impl
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        drop_persisted_rdds()
    for _ in range(reps):
        for variant, impl in (("orig", orig_impl), ("new", new_impl)):
            dedup.jaccard_prefix_pairs = impl
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[variant].append(round(time.perf_counter() - t0, 3))
            drop_persisted_rdds()
    dedup.jaccard_prefix_pairs = new_impl
    paired = [o - n for o, n in zip(runs["orig"], runs["new"])]
    print(
        json.dumps(
            {
                "p90_prefix_jaccard": {
                    "orig": runs["orig"],
                    "new": runs["new"],
                    "orig_median": statistics.median(runs["orig"]),
                    "new_median": statistics.median(runs["new"]),
                    "paired_diff_median": statistics.median(paired),
                }
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
