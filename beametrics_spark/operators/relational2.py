"""Relational coverage, wave 2: outer joins, GROUPING SETS, sliding
windows, scalar-function library, SQL-API subqueries, ranking variants.

Several queries here go through ``spark.sql`` deliberately — the SQL API
is part of the engine surface (Catalyst produces the same plan either
way), and GROUPING SETS / EXISTS subqueries are most natural there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table, register_views


@register(
    "full_outer_join_order_counts",
    """
    SELECT c.c_custkey, c.c_mktsegment, count(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c
    FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def full_outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (no DataFrame equivalent pre-4.0)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "sliding_window_counts",
    """
    WITH starts AS (
      SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '60 seconds', ts) - INTERVAL '60 seconds'
      FROM events
    )
    SELECT window_start, count(*) AS n
    FROM starts GROUP BY 1
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — 120 s width, 60 s slide: each event lands
    in exactly two windows. The reference supports fixed windows only
    (SURVEY.md §2.2); `F.window(ts, width, slide)` is the Spark-native
    generalization (the oracle enumerates the two bucket offsets)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "120 seconds", "60 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


@register(
    "scalar_function_showcase",
    """
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 3)) AS prio,
           date_part('year', o_orderdate) AS yr,
           date_part('month', o_orderdate) AS mo,
           ROUND(sqrt(o_totalprice), 4) AS sqrt_price,
           ROUND(ln(o_totalprice + 1), 4) AS ln_price,
           length(o_orderstatus) AS status_len,
           concat(o_orderstatus, '-', o_orderpriority) AS tag,
           abs(CAST(o_custkey AS BIGINT) - 100) AS key_dist
    FROM orders
    """,
)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar library over one scan — all JVM built-ins
    (the reference's only scalar ops are json.loads/str/float,
    SURVEY.md §2.2)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.expr("substr(o_orderpriority, 3)")).alias("prio"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.round(F.log(F.col("o_totalprice") + 1), 4).alias("ln_price"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.abs(F.col("o_custkey").cast("long") - 100).alias("key_dist"),
    )


@register(
    "exists_subquery_big_spenders",
    """
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o2
      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
    )
    """,
)
def exists_subquery_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL parser — Catalyst
    rewrites to semi/anti joins (same plan as the DataFrame variants in
    relational.py)."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o2
          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
        )
        """
    )


@register(
    "ranking_variants",
    """
    SELECT o_orderpriority, o_orderkey,
           dense_rank() OVER w AS drk,
           ntile(4) OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS prk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def ranking_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
    )


@register(
    "json_props_analysis",
    """
    SELECT COALESCE(json_extract_string(props, '$.k'), '<missing>') AS k,
           count(*) AS n,
           ROUND(AVG(value), 2) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def json_props_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON field analysis (get_json_object ≡
    json_extract_string)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.coalesce(
                F.get_json_object("props", "$.k"), F.lit("<missing>")
            ).alias("k")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
    )


@register(
    "conditional_aggregation",
    """
    SELECT user_id,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           ROUND(AVG(CASE WHEN value > 100 THEN value END), 2) AS avg_big
    FROM events
    GROUP BY user_id
    """,
)
def conditional_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ),
            2,
        ).alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.round(
            F.avg(F.when(F.col("value") > 100, F.col("value"))), 2
        ).alias("avg_big"),
    )
