"""MinHash-LSH stage decomposition (VERDICT r12 #2-style, applied to
the LSH family that feeds FOUR headline queries: dedup_minhash_lsh,
corpus_dedup_keep_list, quality_aware_keep_list, curation_pipeline_v2).

Times each cumulative prefix of the pipeline with the dedicated
noop-sink protocol so the incremental cost of every stage is explicit:

  1 gram_hash   tokenize + zip/explode + 1 xxhash64 per gram occurrence
  2 minhash     + groupBy(doc_id) with K min(xxhash64(i, fp)) columns
  3 candidates  + banding, bucket groupBy, pair explode, distinct
  4 verified    + exact verification (candidate gram sets, broadcast)
  5 cc          connected_components over the verified pairs
  6 keep_list   full corpus_dedup_keep_list

Usage: python scripts/lsh_stage_probe.py SF_DIR [trials]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beametrics_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from beametrics_spark.operators import dedup
    from beametrics_spark.operators.curation import (
        _verified_pairs,
        connected_components,
        dedup_keep_list,
    )
    from beametrics_spark.sources import load_table

    spark = get_spark("lsh-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def docs():
        return load_table(spark, sf_dir, "documents")

    stages = {
        "1_gram_hash": lambda: dedup.gram_hash_rows(docs()),
        "2_minhash": lambda: dedup._minhash_from_base_hashes(
            dedup.gram_hash_rows(docs())
        ),
        "3_candidates": lambda: dedup.lsh_candidates(docs()),
        "4_verified": lambda: dedup.minhash_lsh_pairs(docs()),
        "5_cc": lambda: connected_components(_verified_pairs(docs())),
        "6_keep_list": lambda: dedup_keep_list(spark, docs()),
    }
    # plan warm-up at the smallest SF (codegen/JIT) per stage
    warm = "/root/testdata/sf0.001"
    for name, build in stages.items():
        sf_hold = sf_dir
        sf_dir = warm
        try:
            build().write.format("noop").mode("overwrite").save()
        finally:
            sf_dir = sf_hold
        ts = []
        for _ in range(trials):
            spark.catalog.clearCache()
            # session-aging hygiene (see bench.py)
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(
            f"{name:14s} min {min(ts):7.3f}s  trials "
            f"{[round(t, 3) for t in ts]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
