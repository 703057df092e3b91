"""Interleaved A/B for the r15 outer-explode fix in
_shingle_pair_intersections: ORIG (HEAD version — plain explode, whose
InferFiltersFromGenerate filter re-runs the shingle transform per doc
at the scan) vs NEW (working tree — explode_outer + isnotnull).  The
orig implementation is exec'd from `git show HEAD:...` into the dedup
module's namespace so both variants share every helper.
Usage: python scripts/ab_shingle_outer.py p05_ngram_jaccard [reps]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
FUNC = "_shingle_pair_intersections"


def main() -> None:
    from spear_spark.context import get_spark
    from spear_spark.operators import dedup

    names = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 5

    new_impl = getattr(dedup, FUNC)
    head_src = subprocess.run(
        ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "show", "HEAD:spear_spark/operators/dedup.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    m = re.search(rf"(?ms)^def {FUNC}\(.*?(?=^def )", head_src)
    assert m, f"could not extract {FUNC} from HEAD"
    ns = dict(vars(dedup))
    exec(compile(m.group(0), "HEAD:" + FUNC, "exec"), ns)
    orig_impl = ns[FUNC]

    spark = get_spark(
        app_name="ab_shingle_outer",
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
    a = orig_impl(docs, "text", "doc_id", 3, None)
    b = new_impl(docs, "text", "doc_id", 3, None)
    print(json.dumps({"identity": {
        "orig_rows": a.count(), "new_rows": b.count(),
        "orig_minus_new": a.exceptAll(b).count(),
        "new_minus_orig": b.exceptAll(a).count()}}), flush=True)
    drop_persisted_rdds()

    out = {}
    for name in names:
        fn = qs[name]
        runs = {"orig": [], "new": []}
        for variant, impl in (("new", new_impl), ("orig", orig_impl)):
            setattr(dedup, FUNC, impl)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            drop_persisted_rdds()
        for _ in range(reps):
            for variant, impl in (("orig", orig_impl), ("new", new_impl)):
                setattr(dedup, FUNC, impl)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs[variant].append(round(time.perf_counter() - t0, 3))
                drop_persisted_rdds()
        setattr(dedup, FUNC, new_impl)
        paired = [o - n for o, n in zip(runs["orig"], runs["new"])]
        out[name] = {
            "orig_median": statistics.median(runs["orig"]),
            "new_median": statistics.median(runs["new"]),
            "paired_diff_median": statistics.median(paired),
            "orig": runs["orig"], "new": runs["new"],
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
