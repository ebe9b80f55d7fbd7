"""Graph analytics over relational data: PageRank on the bipartite
customer↔supplier interaction graph (edges = who traded with whom, from
orders ⋈ lineitem, weighted by line count).

Beyond connected components (curation.py), this is the second iterative
distributed algorithm expressed purely as DataFrame joins/aggregations —
the pattern that at 100 TB replaces any specialized graph runtime for
bounded-iteration analytics: edges live edge-partitioned, each power
iteration is one join (rank ⋈ edges on src) + one hash aggregate (sum
by dst), and lineage is truncated per round with localCheckpoint so the
plan never grows with the iteration count.

Determinism contract with the DuckDB oracle: FIXED iteration count
(unrolled CTEs on the oracle side), identical damping and
normalization arithmetic, ranking on the ROUNDED score with a node-id
tiebreak — parallel-summation ulp noise cannot reorder the output.

The reference has no graph analytics (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

DAMPING = 0.85
N_ITER = 5
TOP_N = 25


def _pagerank_oracle() -> str:
    it = """
pr{n} AS (
  SELECT e.dst AS node,
         (1 - {d}) / nn.n + {d} * sum(p.pr * e.w / ow.outw) AS pr
  FROM edges e
  JOIN pr{p} p ON p.node = e.src
  JOIN outw ow ON ow.src = e.src
  CROSS JOIN nn
  GROUP BY e.dst, nn.n
)"""
    iters = ",".join(
        it.format(n=i, p=i - 1, d=DAMPING) for i in range(1, N_ITER + 1)
    )
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
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS outw FROM edges GROUP BY 1),
pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn),
{iters}
SELECT node, round(pr, 9) AS pagerank
FROM pr{N_ITER}
ORDER BY round(pr, 9) DESC, node ASC
LIMIT {TOP_N}
"""


@register("pagerank_customer_supplier", _pagerank_oracle())
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP} nodes by PageRank after {IT} power iterations over the
    bidirectional customer↔supplier trade graph — 'which suppliers sit
    at the center of the order network' (and which customers anchor
    them), the influence measure degree counts miss because it
    propagates through neighbors' importance.

    Every node's rank is re-derived each round from the edge list —
    rank(v) = (1-d)/N + d·Σ_{{u→v}} rank(u)·w/outw(u) — so the whole
    algorithm is |iterations| × (join + hash aggregate).  The oracle
    unrolls the same {IT} iterations as CTEs; the final ordering ranks
    on the 9-dp ROUNDED score with a node tiebreak, so cross-engine
    summation-order ulps cannot flip the cut.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(
            lineitem, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = raw.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), "w"
    ).unionAll(raw.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w"))
    edges = edges.localCheckpoint(eager=True)

    nodes = edges.select("src").distinct().withColumnRenamed("src", "node")
    n_nodes = nodes.count()  # scalar only — never a row collect
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    contrib_edges = edges.join(outw, "src").localCheckpoint(eager=True)

    rank = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(N_ITER):
        rank = (
            contrib_edges.join(rank, rank["node"] == contrib_edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit((1 - DAMPING) / n_nodes)
                    + DAMPING
                    * F.sum(F.col("pr") * F.col("w") / F.col("outw"))
                ).alias("pr")
            )
            .localCheckpoint(eager=True)
        )
    scored = rank.select("node", F.round("pr", 9).alias("pagerank"))
    return scored.orderBy(F.desc("pagerank"), F.asc("node")).limit(TOP_N)


pagerank_customer_supplier.__doc__ = (
    pagerank_customer_supplier.__doc__.replace("{TOP}", str(TOP_N)).replace(
        "{IT}", str(N_ITER)
    )
)
