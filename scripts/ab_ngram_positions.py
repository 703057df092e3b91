"""Query-level interleaved A/B for the ngram_positions rewrite: the
streaming Generate form (explode(sequence) + slice/array_join) vs the
gram-array form ([pos]explode(ngram_list_from_tokens)).  Patches the
helper in both dedup and profile namespaces, alternates run-by-run in
one session, reports medians + paired diffs.

Usage: python scripts/ab_ngram_positions.py p83_health_report p85_repeated_ngrams [reps]
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
    from spear_spark.operators import profile as profile_mod
    from spear_spark.operators.dedup import ngram_list_from_tokens

    names = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 5

    new_impl = dedup.ngram_positions

    def orig_impl(df, keep, toks, n, gram_alias="gram", pos_alias=None):
        staged = df.select(*keep, toks.alias("_ng_t"))
        keep_names = [c for c in staged.columns if c != "_ng_t"]
        if pos_alias is None:
            return staged.select(
                *keep_names,
                F.explode(ngram_list_from_tokens(F.col("_ng_t"), n)).alias(
                    gram_alias
                ),
            )
        return staged.select(
            *keep_names,
            F.posexplode(ngram_list_from_tokens(F.col("_ng_t"), n)).alias(
                pos_alias, gram_alias
            ),
        )

    spark = get_spark(
        app_name="ab_ngram_positions",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark.range(1000).count()

    def set_impl(impl) -> None:
        dedup.ngram_positions = impl
        profile_mod.ngram_positions = impl

    def drop_persisted_rdds() -> None:
        sc = spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().valuesIterator()
        while it.hasNext():
            it.next().unpersist(True)

    for name in names:
        fn = qs[name]
        runs = {"orig": [], "new": []}
        for variant, impl in (("new", new_impl), ("orig", orig_impl)):
            set_impl(impl)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            drop_persisted_rdds()
        for _ in range(reps):
            for variant, impl in (("orig", orig_impl), ("new", new_impl)):
                set_impl(impl)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs[variant].append(round(time.perf_counter() - t0, 3))
                drop_persisted_rdds()
        set_impl(new_impl)
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
