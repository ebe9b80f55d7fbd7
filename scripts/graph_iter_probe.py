"""Round-14 planner probe for the iterative graph family.

Verifies the assumption the r14 rewrite rests on: a DataFrame
localCheckpoint() preserves outputPartitioning/outputOrdering in its
LogicalRDD, so an edge table checkpointed AFTER repartition("src") can
feed every iteration's join/agg WITHOUT a per-iteration exchange.

Usage: python scripts/graph_iter_probe.py [sf_dir]
Prints the plans of (a) groupBy over a checkpointed repartition, and
(b) a join against it, and counts Exchange nodes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beametrics_spark.session import get_spark  # noqa: E402
from beametrics_spark.sources import load_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("graph_iter_probe")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(lineitem, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
            "w",
        )
    )
    edges = (
        raw.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w")
        .unionAll(raw.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w"))
        .repartition("src")
        .localCheckpoint(eager=True)
    )

    agg = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    plan_a = agg._jdf.queryExecution().executedPlan().toString()
    print("=== (a) groupBy(src) over checkpointed repartition('src') ===")
    print(plan_a)
    print("exchanges in (a):", plan_a.count("Exchange"))

    labels = edges.select(F.col("src").alias("node"), F.col("src").alias("lab")).distinct()
    joined = edges.join(labels, labels["node"] == edges["src"]).groupBy(
        F.col("dst").alias("node"), "lab"
    ).agg(F.sum("w").alias("wsum"))
    plan_b = joined._jdf.queryExecution().executedPlan().toString()
    print("=== (b) edges ⋈ labels(node) + groupBy(dst,lab) ===")
    print(plan_b)
    print("exchanges in (b):", plan_b.count("Exchange"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
