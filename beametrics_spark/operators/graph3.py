"""Graph analytics, wave 3: synchronous label propagation communities
on the bidirectional customer↔supplier trade graph — the third
iterative distributed algorithm expressed purely as DataFrame
joins/aggregations (after PageRank, graph.py, and connected
components, curation.py). LPA finds denser trade communities than
components (which only need ANY path) and costs the same per round:
one join + one hash aggregate + one per-node argmax.

Determinism contract (same pattern as pagerank_customer_supplier):
FIXED iteration count, unrolled CTEs on the oracle side, and —
stronger here — the ENTIRE pipeline is integer arithmetic (edge
weights and weighted label tallies are longs), so there is no
floating-point anywhere to diverge; the argmax tiebreak is
(tally DESC, label ASC), total and engine-independent.

100 TB notes: edges live edge-partitioned and are localCheckpointed
once; each of the K iterations shuffles (node, label) tallies — map-
side combined, bounded by Σ_v distinct-neighbor-labels(v) ≤ |E| — and
the per-node argmax window partitions by dst with ≤ degree(v) rows
per node. Hub nodes concentrate their window partition; AQE skew
handling (enabled engine-wide) splits the preceding exchange, and the
window itself is a WindowGroupLimit top-1 after Spark's group-limit
pushdown, so only the running best row per node is retained. Lineage
is truncated per round with localCheckpoint so the plan never grows
with the iteration count.

The reference has no graph analytics (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

N_ITER = 3
TOP_N = 25


def _lpa_oracle() -> str:
    it = """
lp{n} AS (
  SELECT node, lab FROM (
    SELECT e.dst AS node, p.lab AS lab, sum(e.w) AS wsum,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY sum(e.w) DESC, p.lab ASC) AS rn
    FROM edges e JOIN lp{p} p ON p.node = e.src
    GROUP BY e.dst, p.lab
  ) WHERE rn = 1
)"""
    iters = ",".join(it.format(n=i, p=i - 1) for i in range(1, N_ITER + 1))
    return f"""
WITH raw AS (
  SELECT 'c:' || o.o_custkey AS c, 's:' || l.l_suppkey AS s, count(*) AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT c AS src, s AS dst, w FROM raw
  UNION ALL
  SELECT s AS src, c AS dst, w FROM raw
),
lp0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
{iters}
SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_nodes
FROM lp{N_ITER}
GROUP BY 1
ORDER BY n_nodes DESC, community ASC
LIMIT {TOP_N}
"""


@register("label_prop_communities", _lpa_oracle())
def label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP} trade communities by size after {IT} synchronous label-
    propagation rounds over the bidirectional customer↔supplier graph:
    every node starts as its own label; each round it adopts the label
    with the largest edge-weighted tally among its neighbors
    (tiebreak: smallest label). Communities emerge where trade is
    dense — a strictly finer structure than connected components.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(lineitem, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = (
        raw.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w")
        .unionAll(
            raw.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
        )
        .localCheckpoint(eager=True)
    )

    labels = edges.select(
        F.col("src").alias("node"), F.col("src").alias("lab")
    ).distinct()
    w_arg = Window.partitionBy("node").orderBy(F.desc("wsum"), F.asc("lab"))
    for _ in range(N_ITER):
        labels = (
            edges.join(labels, labels["node"] == edges["src"])
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.sum("w").alias("wsum"))
            .withColumn("rn", F.row_number().over(w_arg))
            .filter(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), F.asc("community"))
        .limit(TOP_N)
    )


label_prop_communities.__doc__ = label_prop_communities.__doc__.replace(
    "{TOP}", str(TOP_N)
).replace("{IT}", str(N_ITER))
