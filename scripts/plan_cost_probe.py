"""Split a query's wall into CONSTRUCTION (Python DataFrame build +
Catalyst analysis/optimization/physical planning + codegen compile) vs
EXECUTION (running the compiled plan), dedicated-process, min-of-N.

VERDICT r12 #2/#4/#7 all point at the construction-timed family
(semdedup, minhash audit, retrieval, curation pipelines): bench.py
rebuilds those per trial, so their bench number is construction +
execution, and construction (JVM compilation) is what degrades as the
session ages. This probe measures the two parts separately so each
optimization targets the real component.

Usage: python scripts/plan_cost_probe.py SF_DIR query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beametrics_spark.registry import load_all  # noqa: E402
from beametrics_spark.session import get_spark  # noqa: E402

N = 3


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("plan-cost-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()
    print(
        f"{'query':38s} {'build_py':>9s} {'plan':>9s} {'exec1':>9s} "
        f"{'exec_min':>9s} {'rebuild_total':>13s}"
    )
    for name in names:
        fn, _ = qs[name]
        # warm codegen/JIT at the smallest SF like bench.py does
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

        builds, plans, ex1s, exns, totals = [], [], [], [], []
        for _ in range(N):
            spark.catalog.clearCache()
            # session-aging hygiene (see bench.py)
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            # force analysis + optimization + physical planning + codegen
            # setup without executing: executedPlan is lazily built
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            # re-execute the SAME df (cached plan): pure execution
            df.write.format("noop").mode("overwrite").save()
            t4 = time.perf_counter()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            ex1s.append(t3 - t2)
            exns.append(t4 - t3)
            totals.append(t3 - t0)
        print(
            f"{name:38s} {min(builds):9.3f} {min(plans):9.3f} "
            f"{min(ex1s):9.3f} {min(exns):9.3f} {min(totals):13.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
