"""Interleaved A/B: minhash_signatures' gram-array construction
(zip_with word-shingle chain / transform char-gram HOF + array_distinct
+ explode) vs a streaming codegen Generate (explode(sequence) +
slice/array_join or substring) that never builds the gram array and
skips the distinct — MIN over duplicate grams equals MIN over the
distinct set, so the signature table is bit-identical.

Verifies row-identity first (exceptAll both ways), then alternates
orig/new run-by-run in one session and reports medians + paired diffs
for the affected catalog queries.

Usage: python scripts/ab_minhash_sig.py p02_minhash_signatures p134_edit_distance_char [reps]
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
        MERSENNE31,
        _minhash_sig_from_arrays,
        _widen_narrow_scan,
        char_shingles,
        h64,
        minhash_perms,
        shingles,
    )
    from spear_spark.operators.text import tokens

    names = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 5

    orig_minhash_signatures = dedup.minhash_signatures

    def new_minhash_signatures(df, text_col, id_col, k=12, shingle_n=3,
                               char_n=None):
        df = _widen_narrow_scan(df)
        if char_n is None:
            staged = df.select(F.col(id_col), tokens(text_col).alias("_tk"))
            npos = F.size("_tk") - (shingle_n - 1)
            gram = F.array_join(F.slice(F.col("_tk"), F.col("_i"), shingle_n), " ")
        else:
            staged = df.select(
                F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("_tk")
            )
            npos = F.length("_tk") - (char_n - 1)
            gram = F.substring(F.col("_tk"), F.col("_i"), F.lit(char_n))
        seq = F.when(
            npos >= 1, F.sequence(F.lit(1), F.greatest(npos, F.lit(1)))
        ).otherwise(F.array().cast("array<int>"))
        pos = staged.select(F.col(id_col), "_tk", F.explode(seq).alias("_i"))
        hv = pos.select(F.col(id_col), (h64(gram) % MERSENNE31).alias("_hv"))
        aggs = [
            F.min((F.lit(a) * F.col("_hv") + F.lit(b)) % MERSENNE31).alias(f"mh{i}")
            for i, (a, b) in enumerate(minhash_perms(k))
        ]
        return hv.groupBy(id_col).agg(*aggs)

    spark = get_spark(
        app_name="ab_minhash_sig",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark.range(1000).count()

    # --- row-identity: word and char signature tables, old vs new ---
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    for label, kw in (("word", {}), ("char7", {"char_n": 7})):
        a = orig_minhash_signatures(docs, "text", "doc_id", k=12, **kw)
        b = new_minhash_signatures(docs, "text", "doc_id", k=12, **kw)
        ca, cb = a.count(), b.count()
        d1 = a.exceptAll(b).count()
        d2 = b.exceptAll(a).count()
        print(json.dumps({"identity": label, "n_orig": ca, "n_new": cb,
                          "orig_minus_new": d1, "new_minus_orig": d2}), flush=True)
        assert ca == cb and d1 == 0 and d2 == 0, f"row identity FAILED for {label}"

    def drop_persisted_rdds() -> None:
        sc = spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().valuesIterator()
        while it.hasNext():
            it.next().unpersist(True)

    for name in names:
        fn = qs[name]
        runs = {"orig": [], "new": []}
        for variant, impl in (("new", new_minhash_signatures),
                              ("orig", orig_minhash_signatures)):
            dedup.minhash_signatures = impl
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            drop_persisted_rdds()
        for _ in range(reps):
            for variant, impl in (("orig", orig_minhash_signatures),
                                  ("new", new_minhash_signatures)):
                dedup.minhash_signatures = impl
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs[variant].append(round(time.perf_counter() - t0, 3))
                drop_persisted_rdds()
        dedup.minhash_signatures = orig_minhash_signatures
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
