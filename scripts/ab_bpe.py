"""Interleaved A/B for the BPE vocabulary-grain rewrite: alternate
ORIG (corpus-sized mapInPandas encode via bpe_apply) and NEW
(distinct-word encode + JVM count join) implementations of
bpe_fertility / bpe_coverage in ONE session.  Verifies row-identity
first.  Usage: python scripts/ab_bpe.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

QUERIES = ["p129_bpe_fertility", "p136_bpe_fertility_balanced", "p140_bpe_coverage"]


def main() -> None:
    from pyspark.sql import functions as F

    from spear_spark.context import get_spark
    from spear_spark.operators import text

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    new_fert, new_cov = text.bpe_fertility, text.bpe_coverage

    def orig_fert(df, text_col, group_col, merges, decimals=6):
        enc = text.bpe_apply(df.select(group_col, text_col), text_col, merges)
        staged = enc.select(
            F.col(group_col),
            F.regexp_extract_all(
                F.col(text_col), F.lit(text.BPE_PATTERN), 0
            ).alias("_ws"),
            F.size("bpe_tokens").alias("_t"),
        )
        m = staged.select(
            group_col,
            F.size("_ws").alias("_w"),
            F.length(F.concat_ws("", F.col("_ws"))).alias("_c"),
            "_t",
        )
        return (
            m.groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("_w").alias("n_words"),
                F.sum("_t").alias("n_tokens"),
                F.sum("_c").alias("n_chars"),
            )
            .filter((F.col("n_words") > 0) & (F.col("n_tokens") > 0))
            .select(
                group_col,
                "n_docs",
                "n_words",
                "n_tokens",
                "n_chars",
                F.round(
                    F.col("n_tokens").cast("double") / F.col("n_words"), decimals
                ).alias("fertility"),
                F.round(
                    F.col("n_chars").cast("double") / F.col("n_tokens"), decimals
                ).alias("chars_per_token"),
            )
        )

    def orig_cov(df, text_col, group_col, merges, decimals=6):
        enc = text.bpe_apply(df.select(group_col, text_col), text_col, merges)
        toks = enc.select(F.col(group_col), F.explode("bpe_tokens").alias("_t"))
        return (
            toks.groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.sum((F.length("_t") == 1).cast("long")).alias("n_char_tokens"),
            )
            .select(
                group_col,
                "n_tokens",
                "n_char_tokens",
                (
                    F.round(
                        F.col("n_char_tokens").cast("double") / F.col("n_tokens"),
                        decimals,
                    )
                    + F.lit(0.0)
                ).alias("char_token_frac"),
            )
        )

    spark = get_spark(
        app_name="ab_bpe",
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

    def set_variant(which: str) -> None:
        if which == "orig":
            text.bpe_fertility, text.bpe_coverage = orig_fert, orig_cov
        else:
            text.bpe_fertility, text.bpe_coverage = new_fert, new_cov

    out = {}
    for name in QUERIES:
        fn = qs[name]
        set_variant("orig")
        rows_orig = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        drop_persisted_rdds()
        set_variant("new")
        rows_new = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        drop_persisted_rdds()
        assert rows_orig == rows_new, f"{name}: variants differ!"
        print(f"{name}: row-identity OK ({len(rows_new)} rows)", flush=True)

        runs = {"orig": [], "new": []}
        for variant in ("new", "orig"):
            set_variant(variant)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            drop_persisted_rdds()
        for _ in range(reps):
            for variant in ("orig", "new"):
                set_variant(variant)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs[variant].append(round(time.perf_counter() - t0, 3))
                drop_persisted_rdds()
        diffs = [o - n for o, n in zip(runs["orig"], runs["new"])]
        out[name] = runs
        print(
            f"{name}: orig median {statistics.median(runs['orig'])} "
            f"new median {statistics.median(runs['new'])} "
            f"paired-diff median {statistics.median(diffs)}",
            flush=True,
        )
        print("   orig:", runs["orig"])
        print("   new: ", runs["new"])
    set_variant("new")
    spark.stop()


if __name__ == "__main__":
    main()
