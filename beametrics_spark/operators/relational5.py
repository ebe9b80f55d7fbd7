"""Relational coverage, wave 5: the remaining TPC-H query shapes feasible
on the driver schema (no partsupp table, so Q2/Q9/Q11/Q16/Q20 are out of
scope; lineitem lacks commit/receipt dates and shipmode, so "late" and
"mode" are adapted the same way wave 4's Q4 did).

- Q12 (shipping modes / priority): conditional two-way count per line
  status of late lines split by order urgency.
- Q13 (customer distribution): LEFT OUTER join + two-level aggregation —
  the canonical count-of-counts histogram.
- Q15 (top supplier): aggregate view + join against its own MAX — a
  self-referential subquery shape.
- Q17 (small-quantity revenue): correlated per-part average via a
  windowless pre-aggregation join.
- Q19 (discounted revenue): OR-of-ANDs multi-clause predicate pushed
  into one broadcast-join pass.
- Q21 (suppliers who kept orders waiting): layered EXISTS / NOT-EXISTS
  (left-semi + left-anti on the same fact table with different
  correlated predicates).
- Q22 (global sales opportunity): uncorrelated scalar AVG subquery +
  NOT EXISTS anti join.

The reference implements none of these (SURVEY.md §2.2: no joins, no
subqueries — `beametrics/pipeline.py:164-186` is a single linear chain).

Scale notes (100 TB stance):
- Q13's left join shuffles on custkey once; the second aggregation
  (histogram over counts) runs on the tiny intermediate.
- Q15 computes supplier revenue ONCE and self-joins against its max —
  at scale the revenue aggregate is cached-size (|suppliers|), so the
  max-lookup is a broadcast of one row.
- Q17/Q21 pre-aggregate the correlated side BEFORE joining, turning a
  per-row correlated subquery into one shuffle + one equi-join.
- Q19's disjunctive predicate stays a single scan pass: Catalyst can't
  push OR-of-ANDs into parquet fully, but the common `p_brand IN`
  prefilter rides the broadcast join and the residual runs in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.functions import cents, discounted_e4, e4_dollars
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table


@register(
    "tpch_q12_ship_priority_classes",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL '60 days'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q12_ship_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): among lines
    shipped LATE (driver schema has no receipt/commit dates, so late =
    shipped >60 days after the order date) in one year, count urgent vs
    non-urgent orders per line status. One shuffle join on orderkey; both
    counts come from a single conditional-aggregation pass — no second
    scan, no second shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY 1
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed k
    qualifying orders, for every k — including k=0, which is why the join
    must be LEFT OUTER (an inner join silently drops order-less customers;
    the count-of-counts histogram is the classic place that bug hides).
    The priority exclusion stands in for the reference query's
    o_comment NOT LIKE filter (driver schema has no comment column).
    Count(o_orderkey) — not count(*) — so null-padded rows contribute 0.
    First aggregation shuffles on custkey (reusing the join partitioning);
    the histogram aggregates |customers| rows — negligible at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum quarterly
    revenue — an aggregate view consumed twice (once for rows, once for
    its MAX). The revenue aggregate is built once per run; its max is a
    one-row broadcast joined back as an equality filter, so ties all
    surface (the TPC-H-specified behavior, unlike ORDER BY ... LIMIT 1).
    Revenue accumulates as an exact scaled long
    (functions.discounted_e4) so the max-equality comparison is exact —
    a double sum could make Spark and the oracle disagree on which
    supplier is "the" max at half-ulp boundaries — without the per-row
    Decimal aggregation-buffer tax."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            discounted_e4(F.col("l_extendedprice"), F.col("l_discount"))
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue")
        )
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            # ndigits=4 is the identity on 1e-4-scaled values: the oracle
            # casts the exact decimal straight to double without rounding
            e4_dollars(F.col("total_revenue"), 4).alias("total_revenue"),
        )
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
    WITH avg_qty AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS threshold
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS DOUBLE)
             AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p    ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND p.p_size < 15
      AND l.l_quantity < a.threshold
    GROUP BY ALL
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue that would be
    lost by refusing orders below 20% of a part's average order quantity.
    The correlated `l_quantity < 0.2 * avg(l_quantity per part)` subquery
    is decorrelated by hand: pre-aggregate per-part averages (one shuffle
    on partkey), then equi-join — the shape Catalyst's own
    RewriteCorrelatedScalarSubquery produces, written explicitly so the
    plan is stable. p_size < 15 stands in for the container predicate the
    driver schema lacks. The brand filter broadcasts through part."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15)
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(5,2)))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    GROUP BY ALL
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three OR-ed brand/size/quantity
    clause groups evaluated in ONE pass — the classic "disjunctive
    predicate across two tables" query. part broadcasts; the mixed
    predicate becomes the join's residual condition so no clause needs
    its own scan (a UNION-of-three-queries formulation would read
    lineitem three times — fatal at 100 TB). Catalyst additionally
    derives the implied `p_brand IN (...)` and quantity-range prefilters
    and pushes them to each side's scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(F.broadcast(part), (li.l_partkey == part.p_partkey) & clause)
        .agg(
            e4_dollars(
                F.sum(discounted_e4(F.col("l_extendedprice"), F.col("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL '30 days'
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY 1
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): suppliers who were
    the ONLY late supplier on a finalized multi-supplier order. Late =
    shipped >30 days after the order date (driver schema has no
    commit/receipt dates — same adaptation as Q4/Q12).

    The EXISTS / NOT EXISTS pair is algebraized into per-order
    conditional MIN/MAX instead of correlated semi/anti joins — ONE join
    and ONE aggregate over lineitem:
      - "some other supplier on the order" ⇔ min(suppkey) ≠ max(suppkey)
        (an order's lineitems all share its status, so restricting to
        F-orders' lines loses nothing);
      - "no other LATE supplier" ⇔ min and max of the late suppliers
        coincide (exactly one distinct late supplier) — and then every
        late LINE of the order belongs to that one supplier, so numwait's
        lineitem grain is just the order's late-line count.
    The previous semi+anti formulation instantiated the late-lines join
    subtree twice and probed full lineitem a third time (r04 bench:
    1.09 s, 4.7× DuckDB); here lineitem shuffles ONCE on l_orderkey for
    the orders join and the groupBy reuses that partitioning (zero
    additional exchanges — min/max/sum partial-combine, no distinct
    expansion). Supplier broadcasts at the end; top-100 is
    TakeOrderedAndProject, not a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", is_late.alias("late")
    )
    late_supp = F.when(F.col("late"), F.col("l_suppkey"))
    per_order = lines.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
        F.min(late_supp).alias("lmin"),
        F.max(late_supp).alias("lmax"),
        F.sum(F.col("late").cast("long")).alias("n_late_lines"),
    )
    qualified = per_order.filter(
        (F.col("smin") != F.col("smax"))
        & F.col("lmin").isNotNull()
        & (F.col("lmin") == F.col("lmax"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        qualified.join(F.broadcast(supp), F.col("lmin") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    """
    WITH stats AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7)
    ),
    wealthy AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer, stats
      WHERE c_nationkey IN (1, 3, 5, 7)
        AND CAST(c_acctbal AS DECIMAL(18,2)) * n > s
    )
    SELECT w.c_nationkey,
           count(*) AS numcust,
           CAST(ROUND(SUM(w.c_acctbal), 2) AS DOUBLE) AS totacctbal
    FROM wealthy w
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = w.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2001-01-01'
    )
    GROUP BY 1
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers in target countries with no RECENT orders (every synthetic
    customer has some order, so "never ordered" is degenerate here — the
    date predicate keeps the NOT-EXISTS shape non-empty). c_nationkey
    stands in for the phone-prefix country code the driver schema lacks. The
    uncorrelated AVG subquery is one scalar — computed once and broadcast
    into the balance filter (a cross-join of one row, not a per-row
    recomputation); NOT EXISTS is a left-anti join against orders
    projected to its key column only. At 100 TB the anti join shuffles
    on custkey; everything upstream of it was already pruned to the
    wealthy subset."""
    nations = [1, 3, 5, 7]
    cust = load_table(spark, sf_dir, "customer")
    target = cust.filter(F.col("c_nationkey").isin(nations))
    # "above average" without dividing: bal > s/n ⟺ bal·n > s, with the
    # sum accumulated as exact integer cents — exact in both engines
    # regardless of partial-aggregation order, so a balance within a ulp
    # of the mean can't flip in/out between Spark and DuckDB (Q15 uses
    # the same trick for its max-equality comparison).
    stats = target.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents(F.col("c_acctbal"))).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    wealthy = (
        target.join(F.broadcast(stats))
        .filter(cents(F.col("c_acctbal")) * F.col("n") > F.col("s"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    return (
        wealthy.join(orders, wealthy.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).cast("double").alias("totacctbal"),
        )
    )


@register(
    "central_tendency_per_type",
    """
    WITH base AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(quantile_cont(value, 0.5), 6) AS median_value
      FROM events GROUP BY event_type
    ),
    c AS (
      SELECT event_type, value, COUNT(*) AS cnt
      FROM events GROUP BY event_type, value
    ),
    m AS (
      SELECT event_type, value AS mode_value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, value ASC) AS rk
      FROM c
    )
    SELECT base.event_type, base.n, base.median_value, m.mode_value
    FROM base JOIN m ON base.event_type = m.event_type AND m.rk = 1
    """,
)
def central_tendency_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + mode per event type — the central-tendency
    aggregates the stat-showcase row lacked.

    The median is EXACT (sort-based percentile(0.5), linear
    interpolation — identical arithmetic to DuckDB's quantile_cont, vs
    the sketch-based approx twin in value_quantiles_per_type). The mode
    deliberately avoids both engines' built-in mode(): ties are broken
    arbitrarily there, so it is re-expressed as count-desc/value-asc
    ranking — deterministic, hash-matchable, and the formulation that
    scales (a groupBy(count) + per-type top-1, no global sort). Exact
    medians at 100 TB group sizes want the approx twin instead; this
    entry is the ground-truth pair to it, same pattern as
    value_quantiles_exact_per_type.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    base = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
    )
    counts = events.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("value")
    )
    mode = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("value").alias("mode_value"))
    )
    return base.join(mode, "event_type")


_WEIGHTED_MEDIAN_ORACLE = """
WITH ordered AS (
  SELECT l_returnflag, l_extendedprice, l_quantity,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cum_w,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_w
  FROM lineitem
),
hit AS (
  SELECT l_returnflag, l_extendedprice, tot_w,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cum_w ASC, l_extendedprice ASC) AS rk
  FROM ordered WHERE cum_w * 2 >= tot_w
)
SELECT l_returnflag,
       ROUND(l_extendedprice, 2) AS weighted_median_price,
       CAST(ROUND(tot_w, 2) AS DOUBLE) AS total_weight
FROM hit WHERE rk = 1
"""


WM_BINS = 64  # quantile bins per flag; the final sort touches ~1/BINS of rows


@register("weighted_median_price_per_flag", _WEIGHTED_MEDIAN_ORACLE)
def weighted_median_price_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median price per return flag: the price
    at which half the total shipped quantity is cheaper — the
    fair-aggregation statistic plain median misses when row weights
    differ (a 50-unit line should pull the median 50x harder than a
    1-unit line).

    Two-scan broadcast-percentile plan (VERDICT r5 #1) — the previous
    formulation ran the cumulative-weight window over the FULL lineitem
    table partitioned by a 3-value key, i.e. three reducers each sorting
    ~2B rows at 100 TB.  Here:

      scan 1: global min/max price (one metadata-cheap aggregate)
        define WM_BINS equal-width bins; width_bucket (whole-stage
        codegen — measured 8× cheaper than a quantile-cut
        higher-order-function binning at sf0.1) buckets every row and
        per-(flag, bin) quantity sums reduce the table to
        |flags|×WM_BINS rows.  A tiny window over THAT table finds the
        straddling bin (where the cumulative weight crosses half the
        exact total) plus the exact weight below it.
      scan 2: a broadcast join keeps only rows inside each flag's
        straddling bin (~1/WM_BINS of the table for a non-degenerate
        price distribution); the exact cumulative-weight window sorts
        only those, offset by the already-known weight below the bin.

    Exactness is preserved because the per-bin weights are exact (the
    bin BOUNDARIES are the only approximate choice), the total is
    exact, and the crossing row provably lies in the straddling bin.
    No .collect(): bounds and straddle rows flow as broadcast
    one/three-row DataFrames, so the whole statistic is one lazy plan.
    The join condition re-evaluates the identical width_bucket
    expression — no left-closed/right-open boundary mismatch is
    possible."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("plo"),
        F.max("l_extendedprice").alias("phi"),
    )

    def bucket_of(price):
        # all-equal-prices guard: one bucket; width_bucket needs lo < hi
        return F.when(F.col("phi") > F.col("plo"), F.width_bucket(
            price, F.col("plo"), F.col("phi"), F.lit(WM_BINS)
        )).otherwise(F.lit(1))

    binned = li.crossJoin(F.broadcast(bounds)).select(
        "l_returnflag", bucket_of(F.col("l_extendedprice")).alias("bin"),
        "l_quantity",
    )
    binw = binned.groupBy("l_returnflag", "bin").agg(
        F.sum("l_quantity").alias("w")
    )
    w_cum_bin = (
        Window.partitionBy("l_returnflag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_flag = Window.partitionBy("l_returnflag")
    cum_bins = binw.select(
        "l_returnflag",
        "bin",
        "w",
        F.sum("w").over(w_cum_bin).alias("cum"),
        F.sum("w").over(w_flag).alias("tot_w"),
    )
    w_first = Window.partitionBy("l_returnflag").orderBy("bin")
    straddle = (
        cum_bins.filter(F.col("cum") * 2 >= F.col("tot_w"))
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_returnflag").alias("s_flag"),
            (F.col("cum") - F.col("w")).alias("w_below"),
            "tot_w",
            F.col("bin").alias("sbin"),
        )
        .crossJoin(F.broadcast(bounds))
    )
    in_bin = li.join(
        F.broadcast(straddle),
        (F.col("l_returnflag") == F.col("s_flag"))
        & (bucket_of(F.col("l_extendedprice")) == F.col("sbin")),
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = in_bin.select(
        "l_returnflag",
        "l_extendedprice",
        "tot_w",
        (F.col("w_below") + F.sum("l_quantity").over(w_cum)).alias("cum_w"),
    ).filter(F.col("cum_w") * 2 >= F.col("tot_w"))
    w_pick = Window.partitionBy("l_returnflag").orderBy(
        F.asc("cum_w"), F.asc("l_extendedprice")
    )
    return (
        ordered.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.round("l_extendedprice", 2).alias("weighted_median_price"),
            F.round("tot_w", 2).cast("double").alias("total_weight"),
        )
    )
