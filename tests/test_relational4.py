"""Wave-4 relational operators: remaining TPC-H shapes (Q4/Q5/Q6/Q10/Q14/
Q18), unpivot, lead-lag gaps, first/last windows.

Small-correctness + plan-shape checks; full value parity runs through
scripts/oracle_check.py (every query here has a DuckDB oracle).
"""

from pyspark.sql import functions as F

from beametrics_spark.operators.relational4 import (
    first_last_order_per_customer,
    order_gap_lead_lag,
    tpch_q4_order_priority,
    tpch_q5_local_supplier,
    tpch_q6_forecast_revenue,
    tpch_q7_volume_shipping,
    tpch_q8_market_share,
    tpch_q10_returned_items,
    tpch_q14_promo_effect,
    tpch_q18_large_volume,
    unpivot_lineitem_measures,
)


def test_q4_semi_join_counts(spark, sf_dir):
    """EXISTS compiles to a left-semi join; priorities sum to ≤ quarter's orders."""
    df = tpch_q4_order_priority(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    total = sum(r["order_count"] for r in df.collect())
    quarter = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .count()
    )
    assert 0 < total <= quarter


def test_q5_broadcasts_dims(spark, sf_dir):
    df = tpch_q5_local_supplier(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 25  # at most one row per nation
    assert all(r["revenue"] > 0 for r in rows)


def test_q6_no_shuffle_pure_scan(spark, sf_dir):
    """Q6 must aggregate without any exchange besides the final single-
    partition merge — no hash-partitioned shuffle, no join."""
    df = tpch_q6_forecast_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "hashpartitioning" not in plan
    row = df.collect()[0]
    assert row["revenue"] > 0 and row["n_items"] > 0


def test_q10_topk_deterministic(spark, sf_dir):
    df = tpch_q10_returned_items(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) <= 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q14_single_row_pct(spark, sf_dir):
    rows = tpch_q14_promo_effect(spark, sf_dir).collect()
    assert len(rows) == 1
    assert 0 <= rows[0]["promo_revenue_pct"] <= 100


def test_q18_agg_before_join(spark, sf_dir):
    rows = tpch_q18_large_volume(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    assert all(r["sum_qty"] > 250 for r in rows)
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_q7_both_directions(spark, sf_dir):
    """Only the two requested direction pairs can appear (sf0.001 may have
    zero qualifying pairs — value parity is the sf0.01 oracle's job)."""
    rows = tpch_q7_volume_shipping(spark, sf_dir).collect()
    pairs = {(r["supp_nation"], r["cust_nation"]) for r in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(r["revenue"] > 0 for r in rows)


def test_q8_share_bounded(spark, sf_dir):
    rows = tpch_q8_market_share(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_unpivot_shape(spark, sf_dir):
    rows = unpivot_lineitem_measures(spark, sf_dir).collect()
    flags = {r["l_returnflag"] for r in rows}
    measures = {r["measure"] for r in rows}
    assert measures == {"qty", "price", "discount", "tax"}
    assert len(rows) == 4 * len(flags)


def test_order_gaps_positive(spark, sf_dir):
    rows = order_gap_lead_lag(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_orders"] >= 2
        assert 0 <= r["min_gap_days"] <= r["max_gap_days"]


def test_first_last_one_row_per_customer(spark, sf_dir):
    df = first_last_order_per_customer(spark, sf_dir)
    rows = df.collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert len(rows) == n_cust
    multi = [r for r in rows if r["second_orderkey"] is not None]
    assert multi  # customers with ≥2 orders resolve nth_value(2)


def test_gap_fill_complete_grid(spark, sf_dir):
    """Every (type, hour) slot in range is present; some are zero-filled."""
    from beametrics_spark.operators.windows_ext import timeseries_gap_fill

    rows = timeseries_gap_fill(spark, sf_dir).collect()
    types = {r["event_type"] for r in rows}
    buckets = {r["bucket"] for r in rows}
    assert len(rows) == len(types) * len(buckets)
    assert all(r["n"] >= 0 for r in rows)


def test_fill_forward_no_gaps_after_first(spark, sf_dir):
    """After a type's first observed bucket, filled_value is never the
    leading-gap sentinel unless a real 0 average occurred."""
    from beametrics_spark.operators.windows_ext import timeseries_fill_forward

    rows = timeseries_fill_forward(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["bucket"])):
        by_type.setdefault(r["event_type"], []).append(r["filled_value"])
    for vals in by_type.values():
        seen_real = [v for v in vals if v != 0.0]
        assert seen_real  # every type has at least one observation
