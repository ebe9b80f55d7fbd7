"""Wave-5 relational operators: remaining feasible TPC-H shapes (Q12,
Q13, Q15, Q17, Q19, Q21, Q22).

Small-correctness + plan-shape checks; full value parity runs through
scripts/oracle_check.py (every query here has a DuckDB oracle).
"""

from pyspark.sql import functions as F

from beametrics_spark.operators.relational5 import (
    tpch_q12_ship_priority_classes,
    tpch_q13_customer_distribution,
    tpch_q15_top_supplier,
    tpch_q17_small_quantity_revenue,
    tpch_q19_discounted_revenue,
    tpch_q21_suppliers_kept_waiting,
    tpch_q22_global_sales_opportunity,
)


def test_q12_counts_partition_total(spark, sf_dir):
    """high + low per status equals the late-line total for that status."""
    df = tpch_q12_ship_priority_classes(spark, sf_dir)
    rows = df.collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    late = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .count()
        .collect()
    )
    expected = {r["l_linestatus"]: r["count"] for r in late}
    for r in rows:
        assert r["high_line_count"] + r["low_line_count"] == expected[r["l_linestatus"]]


def test_q13_histogram_covers_all_customers(spark, sf_dir):
    """Histogram masses sum to |customer| — the left join keeps k=0."""
    rows = tpch_q13_customer_distribution(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    # mass conservation proves the outer join kept order-less customers:
    # an inner join would make the histogram sum fall short of |customer|
    assert sum(r["custdist"] for r in rows) == n_cust
    assert all(r["c_count"] >= 0 for r in rows)


def test_q15_max_revenue_supplier(spark, sf_dir):
    """Returned supplier(s) hold exactly the max quarterly revenue."""
    rows = tpch_q15_top_supplier(spark, sf_dir).collect()
    assert rows
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1  # ties only — all rows share the max
    assert rows[0]["total_revenue"] > 0


def test_q17_below_average_threshold(spark, sf_dir):
    rows = tpch_q17_small_quantity_revenue(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # sf0.001 may legitimately have zero qualifying lines; shape must hold
    assert r["n_lines"] >= 0
    if r["n_lines"] > 0:
        assert r["avg_yearly"] > 0


def test_q19_single_pass_broadcast(spark, sf_dir):
    """Disjunctive predicate runs in ONE scan of lineitem (no union plan)."""
    df = tpch_q19_discounted_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("FileScan") <= 2  # lineitem once, part once
    rows = df.collect()
    assert len(rows) == 1


def test_q21_only_late_supplier(spark, sf_dir):
    """The conditional-min/max rewrite must agree row-for-row with an
    independently-built semi+anti formulation (the original correlated
    EXISTS shape), and keep the top-100 ordering contract."""
    from pyspark.sql import functions as F

    from beametrics_spark.sources import load_table

    df = tpch_q21_suppliers_kept_waiting(spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= 100
    for r in rows:
        assert r["numwait"] > 0
    waits = [r["numwait"] for r in rows]
    assert waits == sorted(waits, reverse=True)

    # reference formulation: correlated semi ("some other supplier") +
    # anti ("no other late supplier") joins at lineitem grain
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1, l2, l3 = late.alias("l1"), li.select("l_orderkey", "l_suppkey").alias("l2"), late.alias("l3")
    only_late = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier")
    expected = {
        (r["s_name"], r["numwait"])
        for r in only_late.join(
            F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
        .collect()
    }
    assert {(r["s_name"], r["numwait"]) for r in rows} == expected


def test_q22_anti_join_no_orders(spark, sf_dir):
    """Every counted customer truly has no orders and beats the average."""
    rows = tpch_q22_global_sales_opportunity(spark, sf_dir).collect()
    assert rows
    assert {r["c_nationkey"] for r in rows} <= {1, 3, 5, 7}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    with_orders = {r["o_custkey"] for r in orders.select("o_custkey").collect()}
    target = cust.filter(F.col("c_nationkey").isin([1, 3, 5, 7]))
    avg_bal = target.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal")).first()[0]
    expected = (
        target.filter(F.col("c_acctbal") > avg_bal)
        .filter(~F.col("c_custkey").isin(with_orders))
        .count()
    )
    assert sum(r["numcust"] for r in rows) == expected


def test_weighted_median_degenerate_equal_prices(spark, tmp_path):
    """All prices equal: width_bucket's lo<hi precondition fails, the
    guard routes every row to bin 1, and the median is the single price
    with the full quantity total."""
    import os

    from pyspark.sql import functions as F

    from beametrics_spark.operators.relational5 import (
        weighted_median_price_per_flag,
    )

    rows = [(i, i, "A", 42.0, float(i + 1)) for i in range(10)]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_extendedprice double, l_quantity double",
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    out = weighted_median_price_per_flag(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["weighted_median_price"] == 42.0
    assert r["total_weight"] == float(sum(range(1, 11)))
