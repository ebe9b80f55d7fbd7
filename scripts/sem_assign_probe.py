"""SemDeDup ASSIGNMENT-stage growth probe (VERDICT r7 #2 Done
criterion): time dedup2.sem_assign — seed pick, frozen-tree build, one
Lloyd pass, re-route, re-assign, NO pair stage — at two scales and
print the decade growth next to the dot-count algebra.

The stage is construction-timed (it contains eager localCheckpoints),
so each trial rebuilds the whole lineage — the same protocol bench.py
applies to checkpointing queries.

Usage: python scripts/sem_assign_probe.py <small_sf_dir> <big_sf_dir>
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dots_per_decade(n: int) -> tuple[int, float]:
    """Predicted per-corpus assignment dot count under the tree:
    n·(B roots + ~B per deeper level + leaf fan-out)."""
    from beametrics_spark.operators.dedup2 import (
        SEM_BRANCH,
        SEM_MIN_CLUSTERS,
        SEM_TARGET_CLUSTER,
        _sem_tree_sizes,
    )

    k = max(SEM_MIN_CLUSTERS, math.ceil(n / SEM_TARGET_CLUSTER))
    sizes = _sem_tree_sizes(k)
    per_vec = sizes[0]
    for prev, cur in zip(sizes, sizes[1:]):
        per_vec += cur / prev
    per_vec += k / sizes[-1]
    return k, n * per_vec


def main() -> int:
    small, big = sys.argv[1], sys.argv[2]

    from beametrics_spark.operators.dedup2 import sem_assign
    from beametrics_spark.session import get_spark
    from beametrics_spark.sources import load_table

    spark = get_spark("sem-assign-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    entry._configure(spark)

    rows = []
    for sf_dir in (small, big):
        n = load_table(spark, sf_dir, "embeddings").count()
        k, dots = dots_per_decade(n)
        sem_assign(spark, sf_dir).write.format("noop").mode("overwrite").save()
        trials = []
        for _ in range(2):
            t0 = time.perf_counter()
            sem_assign(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            trials.append(time.perf_counter() - t0)
        rows.append((sf_dir, n, k, dots, min(trials)))
        print(
            f"# {sf_dir}: n={n} k={k} predicted_dots={dots:.0f} "
            f"wall={min(trials):.3f}s",
            file=sys.stderr,
        )

    (d0, n0, k0, dots0, t0s), (d1, n1, k1, dots1, t1s) = rows
    print("| corpus | n | k | tree | predicted assignment dots | wall (s) |")
    print("|---|---|---|---|---|---|")
    from beametrics_spark.operators.dedup2 import (
        SEM_MIN_CLUSTERS,
        SEM_TARGET_CLUSTER,
        _sem_tree_sizes,
    )

    for d, n, k, dots, t in rows:
        sizes = _sem_tree_sizes(k)
        print(f"| {d} | {n} | {k} | {sizes}+leaf | {dots:.2e} | {t:.3f} |")
    print(
        f"\nassignment growth on {n1 // max(n0, 1)}x data: "
        f"dots x{dots1 / dots0:.1f}, wall x{t1s / t0s:.1f} "
        f"(two-level design would be x{(n1 * math.sqrt(k1)) / (n0 * math.sqrt(k0)):.1f} in dots)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
