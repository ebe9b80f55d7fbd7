"""Wave-3 relational operators: range join, Q3 top-k, stat aggregates,
subqueries, RANGE frames, embedding norms, histograms, token frequencies.

Small-correctness + plan-shape checks; full value parity runs through
scripts/oracle_check.py (every query here has a DuckDB oracle).
"""

import math

from pyspark.sql import functions as F

from beametrics_spark.operators.relational3 import (
    embedding_vector_norms,
    moving_avg_time_range,
    range_join_purchases_after_order,
    stat_aggregates_per_flag,
    token_frequencies_top100,
    tpch_q3_shipping_priority,
    value_histogram_per_type,
)


def test_range_join_row_per_order(spark, sf_dir):
    """LEFT join keeps every order exactly once after the group-by."""
    out = range_join_purchases_after_order(spark, sf_dir)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert out.count() == n_orders


def test_range_join_is_hash_join_not_cartesian(spark, sf_dir):
    plan = range_join_purchases_after_order(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_q3_topk_is_take_ordered(spark, sf_dir):
    df = tpch_q3_shipping_priority(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_stat_aggregates_sanity(spark, sf_dir):
    rows = {r["l_returnflag"]: r for r in stat_aggregates_per_flag(spark, sf_dir).collect()}
    for r in rows.values():
        assert r["sd_qty"] is not None and r["sd_qty"] > 0
        assert -1.0 <= r["corr_qty_price"] <= 1.0
        assert r["min_price"] <= r["max_price"]


def test_moving_window_sum_matches_count(spark, sf_dir):
    """Every row's trailing window contains at least itself."""
    out = moving_avg_time_range(spark, sf_dir)
    bad = out.filter((F.col("n_90d") < 1) | (F.col("sum_90d") <= 0)).count()
    assert bad == 0


def test_embedding_norms_values(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    df.createOrReplaceTempView("_emb_tmp")
    # route through the same expressions by building on a tiny frame
    from pyspark.sql import functions as FF

    sq = FF.aggregate(
        "embedding", FF.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    r = df.select(FF.sqrt(sq).alias("n")).first()
    assert math.isclose(r["n"], 5.0)


def test_embedding_norms_dim(spark, sf_dir):
    r = embedding_vector_norms(spark, sf_dir).first()
    assert r["dim"] > 0 and r["l2_norm"] > 0


def test_histogram_buckets_partition_values(spark, sf_dir):
    out = value_histogram_per_type(spark, sf_dir)
    total = out.agg(F.sum("n")).first()[0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events


def test_token_frequencies_sorted_and_nonempty(spark, sf_dir):
    rows = token_frequencies_top100(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(r["token"] for r in rows)
