"""Interleaved A/B timing of two query shapes in ONE session.

The sandbox host shows episodic multi-second (occasionally multi-minute)
CPU-steal stalls, so sequential before/after processes land in different
noise regimes and mins are not comparable. This probe alternates
A,B,A,B,... executions of two DataFrame builders in one session, so both
shapes sample the same noise window; report per-shape MIN and MEDIAN.

Edit PAIRS below / pass a pair name. Usage:
  python scripts/ab_interleave_probe.py SF_DIR PAIR [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beametrics_spark.session import get_spark  # noqa: E402


def _jaccard_pairs_from(sh, key_cols):
    from beametrics_spark.operators.dedup import (
        HOT_GROUP_CAP,
        JACCARD_THRESHOLD,
        drop_hot_groups,
        explode_sorted_pairs,
    )

    posting = (
        sh.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    posting = drop_hot_groups(posting, F.size("ds") > HOT_GROUP_CAP, "x")
    pairs = (
        explode_sorted_pairs(
            posting,
            "ds",
            lambda a, b: [
                a["doc_id"].alias("doc_a"),
                b["doc_id"].alias("doc_b"),
                a["n"].alias("na"),
                b["n"].alias("nb"),
            ],
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return pairs.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 3).alias("jaccard")
    )


def builders(spark, sf_dir: str, pair: str):
    from beametrics_spark.operators import dedup
    from beametrics_spark.sources import load_table

    def docs():
        return load_table(spark, sf_dir, "documents")

    if pair == "jaccard_keys":
        return (
            ("string_keys", lambda: _jaccard_pairs_from(
                dedup.shingle_table(docs()), ["s"])),
            ("hash_pair_keys", lambda: _jaccard_pairs_from(
                dedup.shingle_hash_table(docs()), ["h1", "h2"])),
        )
    raise SystemExit(f"unknown pair {pair}")


def main() -> int:
    sf_dir, pair = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("ab-interleave")
    spark.sparkContext.setLogLevel("ERROR")
    (na, fa), (nb, fb) = builders(spark, sf_dir, pair)
    # codegen/JIT warm-up for BOTH shapes at the small SF
    for _, f in ((na, fa), (nb, fb)):
        hold = sys.argv[1]
        sys.argv[1] = "/root/testdata/sf0.001"
        sys.argv[1] = hold
    gc_mode = os.environ.get("AB_GC", "")
    ta, tb = [], []
    for r in range(rounds + 1):  # round 0 = warm-up, discarded
        for name, fn, acc in ((na, fa, ta), (nb, fb, tb)):
            spark.catalog.clearCache()
            if gc_mode:
                t0 = time.perf_counter()
                spark.sparkContext._jvm.System.gc()
                print(f"  gc took {time.perf_counter()-t0:.3f}s", flush=True)
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if r:
                acc.append(dt)
            print(f"round {r} {name}: {dt:.3f}s", flush=True)
    for name, acc in ((na, ta), (nb, tb)):
        print(
            f"{name:16s} min {min(acc):7.3f}  median "
            f"{statistics.median(acc):7.3f}  trials {[round(t,3) for t in acc]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
