"""Interleaved A/B: exploded positional n-grams built by the zip_with
gram-array chain (ngram_list_from_tokens: n-1 interpreted HOF passes
building ~n²/2 token copies per position, then explode) vs a streaming
codegen Generate: explode(sequence(1, size-n+1)) anchor + per-row
array_join(slice(toks, i, n), ' ') — no HOF, no gram-array
materialization, identical gram strings and multiplicities.

Micro stage A/B first (gram+hash count off the staged token arrays,
row-identity checked), then query-level interleaved A/B.

Usage: python scripts/ab_ngram_explode.py p83_health_report p85_repeated_ngrams [reps]
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


def ngram_explode_new(df, keep, toks_col, n, gram_alias="gram", pos_alias=None):
    """(keep..., [pos,] gram) rows: one codegen Generate + slice/join."""
    from pyspark.sql import functions as F

    npos = F.size(toks_col) - (n - 1)
    seq = F.when(
        npos >= 1, F.sequence(F.lit(1), F.greatest(npos, F.lit(1)))
    ).otherwise(F.array().cast("array<int>"))
    pos = df.select(*keep, F.col(toks_col), F.explode(seq).alias("_i"))
    gram = F.array_join(F.slice(F.col(toks_col), F.col("_i"), n), " ")
    cols = list(keep)
    if pos_alias is not None:
        cols.append((F.col("_i") - 1).alias(pos_alias))
    return pos.select(*cols, gram.alias(gram_alias))


def main() -> None:
    from pyspark.sql import functions as F

    from spear_spark.context import get_spark
    from spear_spark.operators import profile as profile_mod
    from spear_spark.operators.dedup import h64, ngram_list_from_tokens
    from spear_spark.operators.text import tokens

    names = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 5

    spark = get_spark(
        app_name="ab_ngram_explode",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark.range(1000).count()

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    arrs = docs.select(
        F.col("source"), F.col("doc_id"), tokens("text").alias("_t")
    ).localCheckpoint(eager=True)

    def gh_orig():
        return (
            arrs.select(
                F.col("source"),
                F.explode(ngram_list_from_tokens(F.col("_t"), 8)).alias("gram"),
            )
            .select(F.col("source"), h64(F.col("gram")).alias("hv"))
            .groupBy("source", "hv")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def gh_new():
        g = ngram_explode_new(arrs, [F.col("source")], "_t", 8)
        return (
            g.select(F.col("source"), h64(F.col("gram")).alias("hv"))
            .groupBy("source", "hv")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    a, b = gh_orig(), gh_new()
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(json.dumps({"identity_gh": {"orig_minus_new": d1, "new_minus_orig": d2,
                                      "n": a.count()}}), flush=True)
    assert d1 == 0 and d2 == 0

    # positional identity (p85-style): pos0 + gram
    pa = arrs.select(
        F.col("doc_id"), F.posexplode(ngram_list_from_tokens(F.col("_t"), 8))
        .alias("pos0", "gram"))
    pb = ngram_explode_new(arrs, [F.col("doc_id")], "_t", 8, pos_alias="pos0")
    pb = pb.select("doc_id", "pos0", "gram")
    d1 = pa.exceptAll(pb).count()
    d2 = pb.exceptAll(pa).count()
    print(json.dumps({"identity_pos": {"orig_minus_new": d1,
                                       "new_minus_orig": d2}}), flush=True)
    assert d1 == 0 and d2 == 0

    # micro stage timing
    stage_runs = {"orig": [], "new": []}
    for variant, fn in (("new", gh_new), ("orig", gh_orig)):
        fn().write.format("noop").mode("overwrite").save()
    for _ in range(reps):
        for variant, fn in (("orig", gh_orig), ("new", gh_new)):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            stage_runs[variant].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"gh_stage": {
        "orig": stage_runs["orig"], "new": stage_runs["new"],
        "orig_median": statistics.median(stage_runs["orig"]),
        "new_median": statistics.median(stage_runs["new"]),
    }}), flush=True)

    # query-level A/B via monkeypatched profile.corpus_health_report gh branch
    import spear_spark.operators.dedup as dedup_mod

    orig_chr = profile_mod.corpus_health_report

    def drop_persisted_rdds() -> None:
        sc = spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().valuesIterator()
        while it.hasNext():
            it.next().unpersist(True)

    for name in names:
        if name not in qs:
            continue
        fn = qs[name]
        # patch: swap dedup.ngram_list_from_tokens consumers is not
        # expressible as a column; instead monkeypatch the module-level
        # helper used inside corpus_health_report via a wrapped copy.
        runs = {"orig": [], "new": []}

        def run(variant):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[variant].append(round(time.perf_counter() - t0, 3))
            drop_persisted_rdds()

        print(json.dumps({name: "query-level A/B requires the library "
                          "change; run after editing profile.py"}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
