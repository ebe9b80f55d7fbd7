"""Relational analytics operators over the TPC-H-ish tables.

Every operator in SURVEY.md §2.2's "verified absences" list that a SQL
engine would have — joins (broadcast/semi/anti), sorts/top-k, grouping
sets (rollup/cube), distinct aggregation, analytic window functions, set
operations, pivot, sessionization, as-of join — expressed declaratively
so Catalyst picks the physical strategy.

Scale notes (100 TB north star):
  - dimension joins broadcast the small side explicitly (nation 25 rows,
    customer ~1.5 M at SF100 — nation/region always broadcast; customer
    joins rely on AQE to pick broadcast vs shuffle by runtime size);
  - top-k per group uses row_number + filter, which Spark executes as a
    partial top-k within each shuffle partition before the final sort
    (no global sort of the fact table);
  - rollup/cube run as a single pass with the `spark.sql.execution`
    expand operator — no per-grouping-set rescans;
  - the as-of join is a window composition (union + last(ignorenulls))
    instead of a per-key Python merge_asof — stays in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.functions import discounted_e4, e4_dollars
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

# --- TPC-H Q1: pricing summary (scan + 8 aggs) ------------------------------


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                     AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)             AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                     AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                                AS avg_price,
           ROUND(AVG(l_discount), 4)                                     AS avg_disc,
           count(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- multi-way join with broadcast dims: revenue per nation ------------------


@register(
    "revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(5,2)))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join + aggregate with the dimension chain collapsed EARLY:
    customer (broadcast) attaches c_nationkey to orders first, so the
    fact join is ONE lineitem⋈(orderkey→nationkey) hash join and the
    aggregate groups by the 25-value nationkey — where the partial
    aggregate is maximally effective — with the nation-name broadcast
    join deferred to the 25-row result. The r10 shape joined raw
    lineitem⋈orders (full orders payload through the exchange) and
    grouped by the n_name string. sf1 A/B (VERDICT r10 #8, min-of-3
    rebuilt trials): declarative lineitem⋈orders then agg 6.5 s;
    aggregate-below-join (per-orderkey revenue partials first) 4.7 s;
    this nationkey-early shape 3.56 s. The r7 sf0.1 A/B that rejected
    pre-aggregation was taken on a decade where orders broadcasts —
    at sf1 it no longer does, and reducing what rides the orderkey
    exchange is what pays. Revenue accumulates exactly in scaled-long
    units (functions.discounted_e4) so the sum is order-of-summation
    independent and matches the oracle's decimal rounding at half-cent
    boundaries, without the ~5x Decimal aggregation-buffer tax
    (measured 1.0 s -> 0.5 s at sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    order_nation = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_nationkey")
    )
    facts = li.select(
        "l_orderkey",
        discounted_e4(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "r_e4"
        ),
    ).join(order_nation, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        facts.groupBy("c_nationkey")
        .agg(
            F.sum("r_e4").alias("rev_e4"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == nation.n_nationkey,
        )
        .select(
            F.col("n_name").alias("nation"),
            e4_dollars(F.col("rev_e4")).alias("revenue"),
            "n_items",
        )
    )


# --- sort + limit: global top-N --------------------------------------------


@register(
    "top_orders_by_price",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
    )


# --- window function: top-k per group ----------------------------------------


@register(
    "topk_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority — via a sortless exact prune
    (VERDICT r10 #7). Spark's WindowGroupLimit rank-limit pushdown DOES
    fire on the naive window shape, but its partial phase requires a
    full LOCAL SORT of every scan partition below it — measured 3.5 s
    of the old 3.6 s sf1 wall for 1.5M rows. This shape never sorts
    the base table: pass 1 hash-aggregates per-(priority, value-bin)
    counts (map-side combinable, |priorities|·|bins| rows out — the
    bins are a static monotone asinh lattice, no bounds pre-pass);
    a tiny descending cumulative sum finds, per priority, the highest
    bin whose from-the-top count reaches 3 (rows above it number < 3,
    so the true top-3 all sit at-or-above it — an exact-superset
    prune, never approximate); pass 2 re-scans with the broadcast
    cutoffs and runs the real row_number window over the ~0.1%
    survivors. Degenerate only if a priority's whole value mass lands
    in one bin, in which case it falls back to sorting that group —
    never wrong. sf1: 3.58 s → 1.20 s; output pinned equal to the
    naive window in tests/test_round11_ops.py."""
    K = 3
    orders = load_table(spark, sf_dir, "orders")
    cand = orders.select("o_orderpriority", "o_totalprice", "o_orderkey")
    # exactness requirement: the value->bin map need only be
    # NON-DECREASING in o_totalprice (any monotone binning keeps the
    # prune an exact superset — the cutoff bin's from-the-top count
    # already reaches K, so no top-K row can sit in a lower bin).
    # floor(asinh(x)*32) qualifies because libm asinh is faithfully
    # rounded (monotone under double rounding), including across the
    # implicit decimal->double cast; swapping in a non-monotone hash
    # here would silently drop top rows.
    vbin = F.floor(F.asinh(F.col("o_totalprice")) * 32)
    binc = cand.groupBy("o_orderpriority", vbin.alias("bin")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wdesc = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cut = (
        binc.withColumn("cum", F.sum("c").over(wdesc))
        .groupBy("o_orderpriority")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("cum") >= K, F.col("bin"))),
                F.min("bin"),
            ).alias("cutbin")
        )
    )
    surv = cand.join(F.broadcast(cut), "o_orderpriority").filter(
        vbin >= F.col("cutbin")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        surv.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rk",
        )
    )


# --- grouping sets: rollup + cube ---------------------------------------------


@register(
    "rollup_lineitem_qty",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cube_order_counts",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --- distinct aggregation -----------------------------------------------------


@register(
    "distinct_parts_per_flag",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n_rows
    FROM lineitem GROUP BY 1
    """,
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- semi / anti joins ----------------------------------------------------------


@register(
    "customers_with_orders_semi",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "customers_without_orders_anti",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


# --- set operations ---------------------------------------------------------------


@register(
    "set_intersect_building_buyers",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_intersect_building_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    buyers = orders.select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(buyers)


@register(
    "set_except_nonbuyers",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except_nonbuyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.select("c_custkey").exceptAll(
        orders.select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


# --- analytic window functions: running totals + lag -------------------------------


@register(
    "running_order_totals",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(lag(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
    FROM orders
    """,
)
def running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
    )


# --- pivot -----------------------------------------------------------------------


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_user_event_values",
    """
    SELECT user_id,
           ROUND(SUM(value) FILTER (WHERE event_type = 'click'), 2)    AS click,
           ROUND(SUM(value) FILTER (WHERE event_type = 'error'), 2)    AS error,
           ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase,
           ROUND(SUM(value) FILTER (WHERE event_type = 'signup'), 2)   AS signup,
           ROUND(SUM(value) FILTER (WHERE event_type = 'view'), 2)     AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
    )


# --- sessionization (gap > 30 min starts a new session) -----------------------------


@register(
    "sessions_per_user",
    """
    WITH seq AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                      OR date_diff('microsecond', prev_ts, ts) > 1800000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM seq GROUP BY user_id
    """,
)
def sessions_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Normalization contract: both engines emit n_sessions/n_events as 64-bit
    # ints. DuckDB's SUM over integers yields HUGEINT (int128) — left uncast it
    # stringifies/hashes differently from Spark's bigint in the driver's
    # value-hash even when the values are equal (r1 driver row: rows/schema
    # matched, hash didn't). Explicit BIGINT on the oracle + long on the Spark
    # side makes the two hashers agree by construction.
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_seconds = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
    return (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull() | (gap_seconds > 1800.0), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


# --- as-of join: last click before each purchase, per user ---------------------------
# Spark has no native ASOF JOIN; composition: union both event kinds, order
# per user by time, carry the last click timestamp forward with
# last(ignorenulls) over an unbounded-preceding-to-previous-row frame.
# Stays fully in Tungsten — no per-group Python merge_asof needed.


@register(
    "asof_last_click_before_purchase",
    """
    WITH seq AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id, last_click_ts
    FROM seq WHERE event_type = 'purchase'
    """,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    both = events.filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        both.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "last_click_ts")
    )


# --- approximate aggregates (no exact oracle — rows-only check) -----------------------


@register("approx_distinct_users_per_type", None)
def approx_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count — the scale path for cardinality at 100 TB.

    No DuckDB oracle (different sketch); the exact twin is
    `distinct_parts_per_flag`. rsd=0.01 keeps error ≈1 %.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "approx_distinct_error_audit",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           (ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
              <= 0.05 * COUNT(DISTINCT user_id)) AS within_5pct
    FROM events GROUP BY 1
    """,
)
def approx_distinct_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable audit for the HLL++ sketch family (same move as
    ann_ivf_recall_audit for ANN): each engine runs its OWN sketch next
    to the exact distinct count and asserts the estimate lands within a
    5% band. The sketches differ (Spark HLL++ rsd=0.01 vs DuckDB HLL),
    so raw estimates can never hash-match — but exact counts match
    exactly and both sketches sit ~1-2% off, so the tolerance flag is
    deterministic cross-engine. This certifies, through the driver's
    hash gate, that the rows-only `approx_distinct_users_per_type`
    estimate is actually close to truth, not just shaped right."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("est"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_5pct"),
    )


@register(
    "approx_quantile_error_audit",
    """
    WITH a AS (
      SELECT event_type,
             approx_quantile(value, 0.5)  AS q50,
             approx_quantile(value, 0.95) AS q95,
             approx_quantile(value, 0.99) AS q99
      FROM events GROUP BY 1
    ), r AS (
      SELECT e.event_type,
             COUNT(*) AS n,
             SUM(CASE WHEN e.value <= a.q50 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS f50,
             SUM(CASE WHEN e.value <= a.q95 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS f95,
             SUM(CASE WHEN e.value <= a.q99 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS f99
      FROM events e JOIN a USING (event_type)
      GROUP BY 1
    )
    SELECT event_type, n,
           (ABS(f50 - 0.5)  <= 0.02) AS ok50,
           (ABS(f95 - 0.95) <= 0.02) AS ok95,
           (ABS(f99 - 0.99) <= 0.02) AS ok99
    FROM r
    """,
)
def approx_quantile_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable audit for the quantile-sketch family, in RANK space
    — the space where GK (Spark) and t-digest (DuckDB) actually give
    guarantees. Each engine runs its OWN sketch, then measures the exact
    fraction of values at or below each estimate and asserts it lands
    within 2 rank-percent of the target. Value-space tolerance would be
    fragile (the p99 neighborhood can have wide gaps at small SF); rank
    fractions are quantization-bounded at 1/n and sketch-bounded at
    ~1e-4 (accuracy=10000), so the flags are deterministic cross-engine
    even though the raw estimates never hash-match. Certifies the
    rows-only `value_quantiles_per_type` the way
    `approx_distinct_error_audit` certifies the HLL family."""
    events = load_table(spark, sf_dir, "events")
    a = events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("q")
    )
    joined = events.join(F.broadcast(a), "event_type")

    def frac(idx: int):
        return F.avg((F.col("value") <= F.col("q")[idx]).cast("double"))

    r = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        frac(0).alias("f50"),
        frac(1).alias("f95"),
        frac(2).alias("f99"),
    )
    return r.select(
        "event_type",
        "n",
        (F.abs(F.col("f50") - 0.5) <= 0.02).alias("ok50"),
        (F.abs(F.col("f95") - 0.95) <= 0.02).alias("ok95"),
        (F.abs(F.col("f99") - 0.99) <= 0.02).alias("ok99"),
    )


@register("value_quantiles_per_type", None)
def value_quantiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx sketch — rows-only (DuckDB quantile interpolates
    differently than Spark's GK sketch by design)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("q"),
    ).select(
        "event_type",
        F.round(F.col("q")[0], 2).alias("p50"),
        F.round(F.col("q")[1], 2).alias("p95"),
        F.round(F.col("q")[2], 2).alias("p99"),
    )


@register(
    "value_quantiles_exact_per_type",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def value_quantiles_exact_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — the oracle-checked twin of
    `value_quantiles_per_type` (Spark `percentile` and DuckDB
    `quantile_cont` both do linear interpolation on the sorted set;
    the approx variant stays the 100 TB scale path)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.percentile("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias("q"),
    ).select(
        "event_type",
        F.round(F.col("q")[0], 4).alias("p50"),
        F.round(F.col("q")[1], 4).alias("p95"),
        F.round(F.col("q")[2], 4).alias("p99"),
    )
