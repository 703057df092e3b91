"""Capture `.explain("formatted")` for named queries into plans/<tag>/,
as <query>_<suffix>.txt — the before/after plan evidence for an
optimization round.  Usage:

    python scripts/capture_plans.py r14 before p102_dedup_report p59_pagerank
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from spear_spark.context import get_spark

    tag, suffix, *names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: capture_plans.py <tag> <suffix> <query> [...]")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(
        app_name="spear_spark_plans",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
