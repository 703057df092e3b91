"""Interleaved A/B for the round-15 codegen CDC-chunk rewrite:
alternate ORIG (transform hash array + filter + interpreted zip_with
chunk builder) and NEW (fused hash+filter boundary pass + posexplode
Generate + codegen slice/concat_ws) in ONE session so bursty external
host load hits both variants equally.  All consumers import
cdc_chunks at call time, so patching text.cdc_chunks swaps the
implementation for the whole family.
Usage: python scripts/ab_cdc.py p117_cdc_chunks p118_chunk_dedup [reps]
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
    from pyspark.sql import Column, functions as F

    from spear_spark.context import get_spark
    from spear_spark.functions import let_
    from spear_spark.operators import text
    from spear_spark.operators.dedup import h32
    from spear_spark.operators.text import tokens

    names = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 5

    new_impl = text.cdc_chunks

    def orig_impl(df, text_col, id_col, modulus=64):
        def body(toks: Column) -> Column:
            n = F.size(toks)
            hs = F.transform(toks, h32)

            def chunks_of(hs_b: Column) -> Column:
                cut = F.filter(
                    F.sequence(F.lit(1), n),
                    lambda i: F.element_at(hs_b, i) % modulus == 0,
                )
                ends = F.when(
                    (F.size(cut) > 0) & (F.element_at(cut, -1) == n), cut
                ).otherwise(F.concat(cut, F.array(n)))
                starts = F.concat(
                    F.array(F.lit(0)), F.slice(ends, 1, F.size(ends) - 1)
                )
                return F.zip_with(
                    starts,
                    ends,
                    lambda s, e: F.concat_ws(" ", F.slice(toks, s + 1, e - s)),
                )

            return F.when(n > 0, let_(hs, chunks_of)).otherwise(
                F.array().cast("array<string>")
            )

        chunked = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
            F.col(id_col), let_(tokens(F.col(text_col)), body).alias("_chunks")
        )
        return chunked.select(
            id_col,
            F.posexplode("_chunks").alias("chunk_idx", "chunk_text"),
        ).select(
            id_col,
            "chunk_idx",
            F.size(F.split("chunk_text", " ")).alias("n_tokens"),
            F.md5("chunk_text").alias("chunk_hash"),
            "chunk_text",
        )

    spark = get_spark(
        app_name="ab_cdc",
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

    out = {}
    for name in names:
        fn = qs[name]
        runs = {"orig": [], "new": []}
        for variant, impl in (("new", new_impl), ("orig", orig_impl)):
            text.cdc_chunks = impl
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            drop_persisted_rdds()
        for _ in range(reps):
            for variant, impl in (("orig", orig_impl), ("new", new_impl)):
                text.cdc_chunks = impl
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs[variant].append(round(time.perf_counter() - t0, 3))
                drop_persisted_rdds()
        text.cdc_chunks = new_impl
        paired = [o - n for o, n in zip(runs["orig"], runs["new"])]
        out[name] = {
            "orig": runs["orig"],
            "new": runs["new"],
            "orig_median": statistics.median(runs["orig"]),
            "new_median": statistics.median(runs["new"]),
            "paired_diff_median": statistics.median(paired),
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
