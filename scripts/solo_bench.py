"""Solo adjudication bench: run a handful of catalog queries in a fresh
session with bench.py's exact methodology (noop sink, per-run persisted-RDD
drop, median) but MORE reps, so a single query's wall time can be compared
against a committed clean-sweep figure without the 179-query sweep's
cross-query state.  Usage:

    python scripts/solo_bench.py p102_dedup_report p137_dedup_report_chunks

Prints one JSON line {name: {"runs": [...], "median": s}, ...}.
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
REPS = int(os.environ.get("SOLO_REPS", "5"))


def main() -> None:
    from spear_spark.context import get_spark

    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: solo_bench.py <query-name> [...]")

    spark = get_spark(
        app_name="spear_spark_solo_bench",
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
        runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            drop_persisted_rdds()
        out[name] = {"runs": runs, "median": round(statistics.median(runs), 3)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
