"""Interleaved A/B for the connected_components round-fusion change:
alternate ORIG (eager per-round checkpoint + separate signature job)
and NEW (lazy checkpoint materialized by the signature aggregate) in
ONE session, so bursty external host load hits both variants equally.
Prints per-variant run lists, medians, and the paired-difference
median.  Usage: python scripts/ab_cc.py p102_dedup_report [reps]
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

    names = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 5

    new_cc = dedup.connected_components

    def orig_cc(pairs, a="doc_a", b="doc_b", max_iter=50):
        # pre-change loop body: eager checkpoint, signature as a
        # second job over the cached blocks
        id_types = {f.name: f.dataType.typeName() for f in pairs.schema.fields}
        numeric = {"byte", "short", "integer", "long"}
        for col in (a, b):
            if id_types.get(col) not in numeric:
                raise TypeError("integral ids required")
        e = (
            pairs.select(F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        prev_sig = None
        converged = False
        for _ in range(max_iter):
            e = dedup._small_star(dedup._large_star(e)).localCheckpoint()
            sig = tuple(
                e.agg(
                    F.count(F.lit(1)),
                    F.bit_xor(F.xxhash64("u", "v")),
                    F.bit_xor(F.xxhash64(F.col("u") * 31, "v")),
                ).collect()[0]
            )
            if sig == prev_sig:
                converged = True
                break
            prev_sig = sig
        if not converged:
            raise RuntimeError("cc did not converge")
        members = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
        roots = e.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id")).distinct()
        return members.unionAll(roots).distinct()

    spark = get_spark(
        app_name="ab_cc",
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
        # warmup one run of each variant (JVM/code paths), untimed order
        for variant, impl in (("new", new_cc), ("orig", orig_cc)):
            dedup.connected_components = impl
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            drop_persisted_rdds()
        for _ in range(reps):
            for variant, impl in (("orig", orig_cc), ("new", new_cc)):
                dedup.connected_components = impl
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs[variant].append(round(time.perf_counter() - t0, 3))
                drop_persisted_rdds()
        dedup.connected_components = new_cc
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
