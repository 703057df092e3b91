"""Interleaved A/B/C for kmeans_lloyd's round-loop input staging
(VERDICT r14 item 2: p122 regressed 8% from the r14 lazy
localCheckpoint).  Variants, swapped via similarity.kmeans_lloyd in
ONE session (semdedup/kcenter_2pass import it at call time):

  ckpt  — r14 form: work = df.select(vec).localCheckpoint(eager=False)
  none  — pre-r14: work = df.select(vec) (re-scan parquet per round)
  eager — work = df.select(vec).localCheckpoint(eager=True)

Usage: python scripts/ab_kmeans_staging.py p122_semdedup_sampled_fit [reps]
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
    from spear_spark.operators import similarity
    from spear_spark.operators.similarity import (
        first_k_centroids,
        kmeans_lloyd_step,
    )

    names = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 5

    def make_lloyd(staging: str):
        def lloyd(df, vec_col, id_col, k=8, tol=1e-4, max_iters=25,
                  init_centroids=None, decimals=6, info=None):
            if tol <= 0:
                raise ValueError("kmeans_lloyd: tol must be > 0")
            if max_iters < 1:
                raise ValueError("kmeans_lloyd: max_iters must be >= 1")
            cur = (
                [list(map(float, c)) for c in init_centroids]
                if init_centroids is not None
                else first_k_centroids(df, vec_col, id_col, k)
            )
            if not cur:
                raise ValueError("kmeans_lloyd: no centroids (empty input?)")
            work = df.select(F.col(vec_col))
            if staging == "ckpt":
                work = work.localCheckpoint(eager=False)
            elif staging == "eager":
                work = work.localCheckpoint(eager=True)
            converged = False
            iters_run = 0
            drift = None
            for _ in range(max_iters):
                iters_run += 1
                step = kmeans_lloyd_step(work, vec_col, cur, decimals).collect()
                new = [list(c) for c in cur]
                for r in step:
                    new[r["cell"]] = [float(x) for x in r["centroid"]]
                drift = max(
                    sum((a - b) ** 2 for a, b in zip(old, upd)) ** 0.5
                    for old, upd in zip(cur, new)
                )
                if info is not None:
                    info.setdefault("drifts", []).append(drift)
                cur = new
                if drift < tol:
                    converged = True
                    break
            if not converged:
                raise RuntimeError("kmeans_lloyd: did not converge")
            if info is not None:
                info["iterations"] = iters_run
                info["centroids"] = cur
            return kmeans_lloyd_step(work, vec_col, cur, decimals)

        return lloyd

    variants = {
        "ckpt": make_lloyd("ckpt"),
        "none": make_lloyd("none"),
        "eager": make_lloyd("eager"),
    }
    real = similarity.kmeans_lloyd

    spark = get_spark(
        app_name="ab_kmeans_staging",
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
        runs = {v: [] for v in variants}
        for v, impl in variants.items():
            similarity.kmeans_lloyd = impl
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            drop_persisted_rdds()
        for _ in range(reps):
            for v, impl in variants.items():
                similarity.kmeans_lloyd = impl
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs[v].append(round(time.perf_counter() - t0, 3))
                drop_persisted_rdds()
        similarity.kmeans_lloyd = real
        print(
            json.dumps(
                {
                    name: {
                        v: {"runs": r, "median": statistics.median(r)}
                        for v, r in runs.items()
                    }
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
