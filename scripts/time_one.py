"""Dedicated-process sf1 timing for a handful of queries.

Usage: python scripts/time_one.py SF_DIR query [query ...]

Replicates the judge's protocol (VERDICT r10 measurement caveat): one
process per invocation, plan warm-up at sf0.001, then min-of-4 noop-sink
trials with spark.catalog.clearCache() between trials. Compare against
scripts/duckdb_bench.py numbers taken on the same box.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beametrics_spark.registry import load_all  # noqa: E402
from beametrics_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("time_one")
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()
    for name in names:
        fn, _oracle = qs[name]
        # plan warm-up at the smallest SF: codegen + parquet footer reads
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        trials = []
        for _ in range(4):
            spark.catalog.clearCache()
            # session-aging hygiene (see bench.py): without a gc the
            # 2nd+ heavy rebuild runs in a degraded session
            spark.sparkContext._jvm.System.gc()
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            trials.append(time.perf_counter() - t0)
        print(
            f"{name}: min {min(trials):.3f}s  trials "
            f"{[round(t, 3) for t in trials]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
