"""Relational coverage, wave 6: the five TPC-H shapes that canonically
need `partsupp` (Q2/Q9/Q11/Q16/Q20), adapted to the driver schema.

The driver testdata has no partsupp table, so each query keeps the
*shape* that makes the original interesting — the join topology and
subquery structure Catalyst has to plan — with lineitem standing in as
the part↔supplier relation:

- Q2 (min-cost supplier): correlated MIN subquery over a region-filtered
  offer table → window-min over the pre-aggregated offers.
- Q9 (product-type profit): 5-way join with an arithmetic measure
  spanning three tables, grouped by nation × year.
- Q11 (important stock): GROUP BY + HAVING against a global scalar
  aggregate of the same derived table.
- Q16 (supplier-part counts): COUNT(DISTINCT) + NOT IN exclusion
  subquery.
- Q20 (potential part promotion): nested semi-join chain gated by a
  correlated half-of-total threshold.

The reference implements none of these (SURVEY.md §2.2: its pipeline is
a single linear chain, `beametrics/pipeline.py:164-186`).

Scale notes (100 TB stance):
- Q2's offer table is aggregated BEFORE the correlated min: lineitem
  shuffles once on (partkey, suppkey); the window-min then runs over
  |part|×|supplier-per-part| rows, not raw lineitems. Supplier, nation,
  region, and the filtered part side all broadcast.
- Q9 joins lineitem→orders on orderkey (the only big-big join; AQE may
  broadcast orders at bench SF) and broadcasts the three dimensions.
  The measure is computed per-row in codegen before the hash agg, so
  only (nation, year, partial-sums) cross the final shuffle.
- Q11 computes the per-part values once; the global total is a scalar
  broadcast back over the tiny aggregate, and the threshold compare is
  `value * K > total` in exact decimal — no division, no repeated scan.
- Q16's NOT IN is a broadcast left-anti join (the exclusion list is
  |suppliers| rows); COUNT(DISTINCT suppkey) expands to a two-phase
  distinct aggregate on the already-joined narrow projection.
- Q20 pre-aggregates (suppkey, partkey, conditional sums) in one pass —
  the correlated "more than half" predicate becomes a row-local filter
  on that aggregate, then a semi join reduces suppliers before the
  dimension joins.

All money sums accumulate as DECIMAL so partial-aggregation order can't
produce float drift vs the DuckDB oracle; quantity sums are exact in
double (small integers). Yearly buckets are cast to BIGINT on both
sides so the driver's value hash sees identical types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.functions import cents, discounted_e4, e4_dollars
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
      FROM lineitem
      GROUP BY 1, 2
    ),
    eligible AS (
      SELECT o.l_partkey, o.l_suppkey, o.cost,
             s.s_acctbal, s.s_name, n.n_name
      FROM offers o
      JOIN supplier s ON s.s_suppkey = o.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name,
           p.p_partkey, p.p_name, e.cost
    FROM eligible e
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_type = 'LARGE' AND p.p_size <= 15
      AND e.cost = (
        SELECT MIN(e2.cost) FROM eligible e2
        WHERE e2.l_partkey = e.l_partkey
      )
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: cheapest EUROPE supplier per LARGE small-size part.

    The correlated `cost = (SELECT MIN ...)` becomes a window-min over
    the pre-aggregated offer table. Both the part predicate and the
    EUROPE-supplier predicate filter on the aggregate's GROUP KEYS
    (l_partkey / l_suppkey), so they commute with the min and are pushed
    BELOW the lineitem aggregate as broadcast semi joins at the scan
    (VERDICT r9 #6 — the r3 shape aggregated ALL of lineitem to
    (part, supplier) grain and filtered after, paying the full-fact
    hash aggregate for rows whose groups were then discarded; the
    correlated min only needs offers for wanted parts from eligible
    suppliers). The surviving offer table is tiny, so the per-part
    window-min sorts a sliver. MIN of raw doubles is bit-exact in both
    engines, so the equality join against the minimum can't drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    eur = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    wanted_parts = part.filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    pruned = li.join(
        F.broadcast(wanted_parts.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "leftsemi",
    ).join(
        F.broadcast(eur.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
        "leftsemi",
    )
    offers = pruned.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    eligible = offers.join(
        F.broadcast(eur), offers.l_suppkey == eur.s_suppkey
    ).select("l_partkey", "cost", "s_acctbal", "s_name", "n_name")
    min_w = Window.partitionBy("l_partkey")
    cheapest = eligible.withColumn("min_cost", F.min("cost").over(min_w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    return (
        cheapest.join(
            F.broadcast(wanted_parts), cheapest.l_partkey == part.p_partkey
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_product_type_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM(
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(5,2)))
             - CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(l.l_quantity AS DECIMAL(9,2))
               * CAST(0.10 AS DECIMAL(3,2))
           ), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation × order year for widget parts.

    ps_supplycost (no partsupp table) is stood in by 10% of retail price.
    The measure mixes columns from three tables, so it's computed per-row
    in codegen after the joins; only (nation, year) partial sums shuffle.
    Profit accumulates exactly in scaled-long 1e-4-dollar units
    (functions.cents/discounted_e4): both terms have at most 4 decimal
    digits (2-dp price x 2-dp discount; 2-dp retail x integral quantity
    x 0.10), so long arithmetic is exact and skips the Decimal
    aggregation-buffer tax.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")

    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    # supplycost term in 1e-4 dollars: cents(retail) * qty * 0.10 * 100
    profit_e4 = discounted_e4(
        F.col("l_extendedprice"), F.col("l_discount")
    ) - cents(F.col("p_retailprice")) * F.round("l_quantity").cast(
        "bigint"
    ) * F.lit(10)
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(e4_dollars(F.sum(profit_e4)).alias("profit"))


@register(
    "tpch_q11_important_stock",
    """
    WITH v AS (
      SELECT l.l_partkey AS p_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * CAST(l.l_quantity AS DECIMAL(9,2))) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey IN (1, 3, 5)
      GROUP BY 1
    ),
    t AS (SELECT SUM(value) AS total FROM v)
    SELECT v.p_partkey, CAST(ROUND(v.value, 2) AS DOUBLE) AS value
    FROM v, t
    WHERE v.value * 1000 > t.total
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose flow value through nations {1,3,5} exceeds
    0.1% of the total.

    The HAVING-vs-global-scalar compare uses `value * 1000 > total` on
    exact scaled longs (cents x integral quantity) — no division, so a
    part sitting within a ulp of the threshold can't flip between
    engines, and no per-row Decimal buffer. The scalar total is a
    one-row cross join (broadcast NestedLoop) over the per-part
    aggregate, which is |part|-sized, not |lineitem|-sized.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(1, 3, 5)
    )
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(
                cents(F.col("l_extendedprice"))
                * F.round("l_quantity").cast("bigint")
            ).alias("value")
        )
    )
    total = v.agg(F.sum("value").alias("total"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("total"))
        .select(
            "p_partkey",
            e4_dollars(F.col("value") * 100).alias("value"),
        )
    )


@register(
    "tpch_q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier count per (brand, type, size), with a
    NOT IN exclusion list (negative-balance suppliers standing in for the
    original's complaint filter).

    NOT IN over a non-null key compiles to a broadcast left-anti join;
    COUNT(DISTINCT) runs as Spark's two-phase distinct aggregate over the
    narrow (brand, type, size, suppkey) projection.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_potential_part_promotion",
    """
    WITH q AS (
      SELECT l.l_suppkey,
             SUM(CASE WHEN EXTRACT(year FROM l.l_shipdate) = 1997
                      THEN l.l_quantity ELSE 0 END) AS qty_1997,
             SUM(l.l_quantity) AS qty_total
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'red%'
      GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM q WHERE qty_1997 * 2 > qty_total
      )
    """,
)
def tpch_q20_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: ASIA suppliers who shipped more than half a red part's
    lifetime volume during 1997 (availqty-vs-half-demand stood in by a
    1997-vs-total quantity split).

    The correlated threshold is a row-local filter on the (suppkey,
    partkey) pre-aggregate; the IN becomes a semi join that shrinks
    suppliers before the dimension joins. Quantity sums are exact in
    double (small integers), so `qty_1997 * 2 > qty_total` is
    deterministic across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    q = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == 1997, F.col("l_quantity")).otherwise(
                    F.lit(0.0)
                )
            ).alias("qty_1997"),
            F.sum("l_quantity").alias("qty_total"),
        )
    )
    qualifying = q.filter(F.col("qty_1997") * 2 > F.col("qty_total")).select(
        "l_suppkey"
    )
    return (
        supp.join(F.broadcast(qualifying), supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_name", "n_name")
        .distinct()
    )
