"""Bench-py-LIKE sf1 timings for named queries, one batch per process.

Usage: python scripts/sf1_ab_probe.py SF_DIR query [query ...]

Protocol follows bench.py with two DISCLOSED differences (ADVICE r13):
trials default to min-of-N_TRIALS per batch — overridable via
SPARK_GRAFT_BENCH_TRIALS, same env as bench.py, which defaults to 4
where this script keeps a lower per-batch count because the A/B design
alternates many batches per side (the cross-batch min sees >= 4
executions of each side anyway) — and the clearCache/gc cadence is
per-trial here vs per-query in bench.py. Otherwise identical: plan
warm-up at sf0.001, noop-sink trials; CONSTRUCTION_TIMED queries
rebuild their DataFrame per trial
(eager checkpoints / persists are part of their cost), everything else
reuses the built plan. clearCache + driver System.gc() before every
trial (the session-aging hygiene measured in scripts/
ab_interleave_probe.py). Round 13 uses this for the before/after sf1
A/B: the same script is copied into the round-baseline worktree so both
code versions run the IDENTICAL protocol, alternating batches per side
on one box.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CONSTRUCTION_TIMED  # noqa: E402
from beametrics_spark.registry import load_all  # noqa: E402
from beametrics_spark.session import get_spark  # noqa: E402

WARM_DIR = "/root/testdata/sf0.001"
N_TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("sf1-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        fn, _oracle = qs[name]
        noop(fn(spark, WARM_DIR))  # codegen/JIT warm-up, 100x less data
        rebuild = name in CONSTRUCTION_TIMED
        df = None if rebuild else fn(spark, sf_dir)
        if rebuild:  # untimed warm run at the probed scale, like bench.py
            noop(fn(spark, sf_dir))
        trials = []
        for _ in range(N_TRIALS):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir) if rebuild else df)
            trials.append(time.perf_counter() - t0)
        print(
            f"{name}: min {min(trials):.3f}s  trials "
            f"{[round(t, 3) for t in trials]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
