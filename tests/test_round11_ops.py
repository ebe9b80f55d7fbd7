"""Round-11 pins: sortless top-k prune, boundary-row equi-depth
histogram, bucketized attribution join, pre-aggregated backlog join,
near-unique-key repartition-before-aggregate shapes.

- topk_orders_per_priority (relational.py): the bin-prune must emit
  exactly the naive window's rows, and the surviving window must carry
  WindowGroupLimit over the pruned side only — no sort of the base
  table anywhere (the old shape's partial WindowGroupLimit forced a
  full local sort of every scan partition: 3.5 s of its 3.6 s sf1 wall).
- equi_depth_histogram_totalprice (profiling2.py): the closed-form +
  2N-boundary-row reshape must equal the global-ntile formulation
  bit-for-bit, including the n < buckets edge where trailing buckets
  are empty.
- multi_touch_attribution (events4.py): the two-arm bucket expansion
  must equal the plain residual equi-join.
- order_backlog_sweep / tpch_q18 (mining.py, relational4.py): the
  near-unique-key aggregates exchange raw rows first
  (REPARTITION_BY_NUM in the plan), and backlog's join input is the
  aggregated relation.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F


def _final_plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_topk_bin_prune_matches_naive_window(spark, sf_dir):
    from beametrics_spark.operators.relational import topk_orders_per_priority
    from beametrics_spark.sources import load_table

    got = sorted(map(tuple, topk_orders_per_priority(spark, sf_dir).collect()))
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = sorted(
        map(
            tuple,
            orders.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select(
                "o_orderpriority",
                "o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"),
                "rk",
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_topk_plan_never_sorts_base_table(spark, sf_dir):
    """The only Sort below the final Window must sit above the pruning
    join (survivors), and the rank-limit pushdown must still fire on
    that tiny window."""
    from beametrics_spark.operators.relational import topk_orders_per_priority

    df = topk_orders_per_priority(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    assert "WindowGroupLimit" in plan, plan
    # sorts may only touch survivors or the tiny bin table: every Sort
    # in the dump must sit either ABOVE the cutoff BroadcastHashJoin
    # (sorting its pruned output) or INSIDE the broadcast cutoff subtree
    # (the |priorities|x|bins| cumulative window) — never directly over
    # the base-table scan
    first_join = plan.find("BroadcastHashJoin")
    assert first_join != -1, plan
    bexch = plan.find("BroadcastExchange", first_join)
    assert bexch != -1, plan
    stray = plan.find("Sort ", first_join)
    assert stray == -1 or stray > bexch, plan
    # and the prune actually reaches the scan side: the bin lattice is
    # evaluated as the join's residual condition
    assert "ASINH" in plan[first_join : first_join + 200], plan


def test_equi_depth_matches_global_ntile(spark, sf_dir):
    from beametrics_spark.operators.profiling2 import (
        N_HIST_BUCKETS,
        equi_depth_histogram_totalprice,
    )
    from beametrics_spark.sources import load_table

    got = sorted(
        map(tuple, equi_depth_histogram_totalprice(spark, sf_dir).collect())
    )
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = sorted(
        map(
            tuple,
            orders.select(
                "o_totalprice",
                F.ntile(N_HIST_BUCKETS).over(w).alias("bucket"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.min("o_totalprice"), 2).alias("lo"),
                F.round(F.max("o_totalprice"), 2).alias("hi"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) == N_HIST_BUCKETS


def test_equi_depth_small_n_edge(spark, sf_dir, tmp_path):
    """n < buckets: ntile gives buckets 1..n one row each; the
    closed-form reshape must drop the empty trailing buckets."""
    from beametrics_spark.operators.profiling2 import (
        equi_depth_histogram_totalprice,
    )

    small = spark.createDataFrame(
        [(i, 100.0 * i) for i in range(1, 5)],
        "o_orderkey long, o_totalprice double",
    )
    d = str(tmp_path / "tiny")
    small.write.parquet(d + "/orders.parquet")
    rows = sorted(
        map(tuple, equi_depth_histogram_totalprice(spark, d).collect())
    )
    assert rows == [
        (i, 1, 100.0 * i, 100.0 * i) for i in range(1, 5)
    ], rows


def test_multi_touch_bucketized_matches_plain_join(spark, sf_dir):
    from beametrics_spark.operators.events4 import (
        ATTRIBUTION_WINDOW_S,
        multi_touch_attribution,
    )
    from beametrics_spark.functions import cents
    from beametrics_spark.sources import load_table

    got = sorted(map(tuple, multi_touch_attribution(spark, sf_dir).collect()))
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    touched = purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user"))
        & (
            F.col("click_ts")
            >= F.col("p_ts")
            - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS")
        )
        & (F.col("click_ts") < F.col("p_ts")),
    ).withColumn("n_touch", F.count(F.lit(1)).over(Window.partitionBy("p_id")))
    grouped = touched.groupBy(
        F.hour("click_ts").cast("bigint").alias("click_hour"), "n_touch"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(cents(F.col("p_value"))).alias("v_cents"),
    )
    want = sorted(
        map(
            tuple,
            grouped.groupBy("click_hour")
            .agg(
                F.sum("cnt").alias("n_touches"),
                F.round(F.sum(F.col("cnt") / F.col("n_touch")), 4).alias(
                    "credits"
                ),
                F.round(
                    F.sum(
                        F.col("v_cents") / (F.lit(100.0) * F.col("n_touch"))
                    ),
                    2,
                ).alias("attributed_value"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_backlog_joins_aggregated_lineitem(spark, sf_dir):
    """The orders join's lineitem input must be the per-orderkey
    aggregate (HashAggregate below the join), fed by an explicit raw-row
    repartition (REPARTITION_BY_NUM)."""
    from beametrics_spark.operators.mining import order_backlog_sweep

    df = order_backlog_sweep(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    assert "REPARTITION_BY_NUM" in plan, plan
    join = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"),
               plan.find("ShuffledHashJoin"))
    assert join != -1, plan
    agg_after_join = plan.find("HashAggregate", join)
    assert agg_after_join != -1, plan  # the aggregate sits under the join


def test_q18_repartitions_before_quantity_aggregate(spark, sf_dir):
    from beametrics_spark.operators.relational4 import tpch_q18_large_volume

    df = tpch_q18_large_volume(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    assert "REPARTITION_BY_NUM" in plan, plan


def test_revenue_by_nation_groups_by_nationkey(spark, sf_dir):
    """The big aggregate must group by the numeric nationkey with the
    nation-name broadcast join ABOVE it (25-row input), not below."""
    from beametrics_spark.operators.relational import revenue_by_nation

    df = revenue_by_nation(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    agg = plan.find("HashAggregate(keys=[c_nationkey")
    assert agg != -1, plan
    nation_join = plan.find("n_nationkey")
    assert nation_join != -1 and nation_join < agg, plan


def test_exact_global_percentiles_match_naive_window(spark, sf_dir):
    from beametrics_spark.operators.profiling2 import (
        PCT_TARGETS,
        value_percentiles_exact_global,
    )
    from beametrics_spark.sources import load_table

    got = sorted(
        map(tuple, value_percentiles_exact_global(spark, sf_dir).collect())
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .select("value", "event_id")
        .filter(F.col("value").isNotNull())
    )
    ranked = ev.select(
        "value",
        F.row_number()
        .over(Window.orderBy("value", "event_id"))
        .alias("rk"),
    )
    n = ev.count()
    import math

    want = sorted(
        (
            p,
            round(
                ranked.filter(F.col("rk") == max(1, math.ceil(p * n)))
                .collect()[0]["value"],
                4,
            ),
        )
        for p in PCT_TARGETS
    )
    assert got == want
