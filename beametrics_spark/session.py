"""SparkSession factory tuned for the driver's local[32] environment.

At real cluster scale the same settings matter for different reasons:
AQE re-plans shuffle partition counts and skew joins at runtime, UTC
session time keeps event-time windows deterministic across executors,
and Arrow makes the (rare) Pandas-UDF path batch-transfer instead of
row-pickle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "beametrics_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Spark-docs-recommended production setting: coalesce to the
        # advisory partition size instead of keeping default parallelism —
        # a KB-scale shuffle runs 1 task, not 32 near-empty ones. At 100 TB
        # the same advisory size yields thousands of right-sized tasks.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # Advisory size tuned for local[32]: shuffles here are KB-MB scale
        # but CPU-dense per byte (join fan-out, 64-column aggs), so a small
        # target keeps all cores busy while still collapsing trivial
        # shuffles to one task. On a real cluster raise this back to
        # 64-256MB (SPARK_GRAFT_ADVISORY_PARTITION) — per-task overhead is
        # higher and shuffle bytes per query are ~10^6× larger.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "2MB"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Whole-stage codegen cutoff raised above the default 100: the
        # 64-wide signature/embedding aggregates (minhash audit's 64
        # string mins + 16 digest inputs, semdedup's 64 avg() means)
        # sit just past it, and the fallback runs INTERPRETED — r14
        # measured 49.5 s -> 7.2 s on the minhash sf1 signature stage
        # from codegen alone. Scale-independent (the cutoff guards
        # compile time of kilocolumn plans; the widest plan here is
        # ~180 fields) and env-overridable for A/B.
        .config(
            "spark.sql.codegen.maxFields",
            os.environ.get("SPARK_GRAFT_CODEGEN_MAXFIELDS", "400"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.ui.enabled", "false")
        # 20g: the bench session runs 60+ query plans back to back; at 8g
        # old-gen pressure from accumulated codegen classes + broadcast
        # cleanup showed up as multi-second timing outliers on otherwise
        # sub-2s queries. The machine has 128 GiB; a production driver
        # sizes this to its own plan/broadcast volume.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
    )
    return builder.getOrCreate()
