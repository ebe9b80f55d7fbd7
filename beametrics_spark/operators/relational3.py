"""Relational coverage, wave 3: range (interval) joins, a TPC-H Q3-shaped
3-way join with top-k, statistical aggregates, date/time function library,
IN + correlated-scalar subqueries, time-RANGE window frames, embedding
vector math as pure SQL expressions, histogram binning, and token
frequencies via explode.

The reference has none of these (SURVEY.md §2.2: no joins, sorts, set ops,
or scalar library beyond json.loads/str/float) — this wave is the
beyond-reference relational surface a training-data pipeline leans on.

Scale notes (100 TB stance):
- The range join is an equi-join on the key plus a residual time predicate,
  so it hash-partitions on the key (no O(n·m) interval blow-up) and the
  residual filters inside the join.
- Q3 broadcasts the filtered customer dim; top-k is TakeOrderedAndProject
  (no global sort materialization).
- Embedding math stays in JVM higher-order functions (aggregate/transform);
  no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.functions import cents, e4_dollars
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table, register_views


@register(
    "range_join_purchases_after_order",
    """
    SELECT o.o_orderkey, count(e.event_id) AS n_events,
           ROUND(COALESCE(SUM(e.value), 0), 2) AS event_value
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts >= o.o_orderdate
     AND e.ts < o.o_orderdate + INTERVAL '2 hours'
    GROUP BY 1
    """,
)
def range_join_purchases_after_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events attributed to an order if they occur
    within 2 h after the order, for the ordering customer.

    Round-9 bucketized rewrite (the r8 "3× drift" on this query turned
    out to be a reproducible plan defect, not drift): the user key is
    DENSE — ~1.5k distinct customers — so the plain equi-join on
    user_id degenerates into a per-user nested loop over
    (orders × events) residual evaluations, ~10⁹ pairs at sf1
    (measured 23 s). The fix is the classic interval-bucketize: join on
    (user, 2h-time-bucket) with each order expanded to the TWO buckets
    its [date, date+2h) window can touch; an event's bucket is unique,
    so every qualifying (order, event) pair matches in exactly ONE
    bucket arm — same result set, but candidates shrink from
    |orders/user|·|events/user| to same-window pairs only (sf1: 23 →
    ~2 s). LEFT semantics are restored by aggregating the INNER
    bucketed join and left-joining the per-order totals back onto
    orders (coalesce 0 — identical to the oracle's LEFT JOIN + COALESCE
    because SUM over no rows is NULL in both engines). This is the
    bin-join every OSS-Spark range join needs once a key's fan-out is
    large; with a selective key the plain residual hash join is fine."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(F.unix_timestamp(c) / F.lit(7200))  # noqa: E731
    o_exp = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.explode(F.array(bucket("o_orderdate"), bucket("o_orderdate") + 1)).alias(
            "tb"
        ),
    )
    e_b = events.select(
        "user_id", "ts", "event_id", "value", bucket("ts").alias("tb")
    )
    matched = o_exp.join(
        e_b,
        (o_exp.o_custkey == e_b.user_id)
        & (o_exp.tb == e_b.tb)
        & (e_b.ts >= o_exp.o_orderdate)
        & (e_b.ts < F.col("o_orderdate") + F.expr("INTERVAL 2 HOURS")),
        "inner",
    )
    per_order = matched.groupBy("o_orderkey").agg(
        F.count("event_id").alias("n"), F.sum("value").alias("s")
    )
    return (
        orders.select("o_orderkey")
        .join(per_order, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.round(F.coalesce("s", F.lit(0.0)), 2).alias("event_value"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dim filter → 3-way join
    → agg → top-10. Customer (filtered to one segment) is broadcast; the
    orders↔lineitem join shuffles on orderkey; the LIMIT executes as
    TakeOrderedAndProject, never a full global sort. Tie-broken on
    l_orderkey so the top-10 is deterministic for the oracle."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "stat_aggregates_per_flag",
    """
    SELECT l_returnflag,
           count(*) AS n,
           ROUND(stddev_samp(l_quantity), 3) AS sd_qty,
           ROUND(var_samp(l_discount), 6) AS var_disc,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 1) AS covar_qty_price,
           ROUND(min(l_extendedprice), 2) AS min_price,
           ROUND(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY 1
    """,
)
def stat_aggregates_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate library: stddev/variance/corr/covar — all
    single-pass JVM aggregates (partial+final), beyond the reference's
    count/sum-only surface (SURVEY.md §2.1 row 8)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("l_quantity"), 3).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 1).alias(
            "covar_qty_price"
        ),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "date_function_rollup",
    """
    SELECT date_part('year', o_orderdate) AS yr,
           date_part('quarter', o_orderdate) AS qtr,
           date_part('doy', o_orderdate) AS doy_first,
           count(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY date_part('year', o_orderdate), date_part('quarter', o_orderdate),
             date_part('doy', o_orderdate)
    """,
)
def date_function_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + grouping (year/quarter/day-of-year): the
    temporal scalar library the reference lacks entirely."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.dayofyear("o_orderdate").cast("long").alias("doy_first"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "in_subquery_order_status",
    """
    SELECT o_orderstatus, count(*) AS n,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY 1
    """,
)
def in_subquery_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery — Catalyst rewrites to a left-semi join
    (broadcast here: the qualifying-customer set is small)."""
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        GROUP BY o_orderstatus
        """
    )


@register(
    "correlated_scalar_price_ratio",
    """
    SELECT o_orderkey,
           ROUND(o_totalprice / (SELECT AVG(o2.o_totalprice) FROM orders o2
                                 WHERE o2.o_custkey = o.o_custkey), 4) AS ratio_to_cust_avg
    FROM orders o
    """,
)
def correlated_scalar_price_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: each order's price relative to its
    customer's average. Catalyst de-correlates to an aggregate + join —
    one shuffle on custkey, not N subquery executions."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey,
               ROUND(o_totalprice / (SELECT AVG(o2.o_totalprice) FROM orders o2
                                     WHERE o2.o_custkey = o.o_custkey),
                     4) AS ratio_to_cust_avg
        FROM orders o
        """
    )


@register(
    "moving_avg_time_range",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS sum_90d,
           COUNT(*) OVER w AS n_90d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
    """,
)
def moving_avg_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-customer 90-day trailing order spend
    (sum + count; avg = sum/n for the consumer). RANGE frames include all
    ordering peers, so results are deterministic under timestamp ties
    (unlike ROWS). Ordering key is epoch seconds — Spark's rangeBetween
    needs a numeric ordering expression. The sum accumulates as exact
    integer cents (functions.cents) so it is order-of-summation
    independent (a double sum rounds differently per engine at
    half-cent boundaries) at long speed rather than Decimal-buffer
    speed — the window adds one long per row instead of a BigDecimal."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 24 * 3600, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        # ndigits=2 is the identity on cent-scaled values: the oracle
        # casts the exact decimal sum straight to double
        e4_dollars(F.sum(cents(F.col("o_totalprice"))).over(w) * 100).alias(
            "sum_90d"
        ),
        F.count(F.lit(1)).over(w).alias("n_90d"),
    )


@register(
    "embedding_vector_norms",
    """
    SELECT vec_id, label,
           len(embedding) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) / len(embedding), 6) AS mean_component
    FROM embeddings
    """,
)
def embedding_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math as pure Catalyst higher-order functions (aggregate over
    the array) — zero Python, whole-stage-codegen'd, the building block the
    cosine dedup/ANN operators reuse (dedup.cosine_expr)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    comp_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    dim = F.size("embedding")
    return emb.select(
        "vec_id",
        "label",
        dim.cast("long").alias("dim"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(comp_sum / dim, 6).alias("mean_component"),
    )


@register(
    "value_histogram_per_type",
    """
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def value_histogram_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via arithmetic binning — the distributed shape
    of a profiling pass (one shuffle keyed on (type, bucket))."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "event_type",
            F.floor(F.col("value") / 50.0).cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "token_frequencies_top100",
    """
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
      FROM documents
    )
    SELECT token, count(*) AS n
    FROM toks
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 100
    """,
)
def token_frequencies_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency table: explode(split) → count → top-100.
    Partial aggregation runs map-side before the shuffle, so the shuffle
    carries one row per distinct token per partition — not per token
    occurrence; top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
    )
