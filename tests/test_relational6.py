"""Wave-6 relational operators: partsupp-dependent TPC-H shapes adapted
to the driver schema (Q2, Q9, Q11, Q16, Q20).

Small-correctness + semantic invariants; full value parity runs through
scripts/oracle_check.py (every query here has a DuckDB oracle).
"""

from pyspark.sql import functions as F

from beametrics_spark.operators.relational6 import (
    tpch_q2_min_cost_supplier,
    tpch_q9_product_type_profit,
    tpch_q11_important_stock,
    tpch_q16_supplier_part_counts,
    tpch_q20_potential_part_promotion,
)
from beametrics_spark.sources import load_table


def test_q2_rows_hold_the_per_part_minimum(spark, sf_dir):
    """Every returned (part, supplier) offer equals that part's min cost
    among EUROPE-region suppliers — the correlated-min contract."""
    rows = tpch_q2_min_cost_supplier(spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible_min = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_cost"))
        .collect()
    )
    min_by_part = {r["l_partkey"]: r["min_cost"] for r in eligible_min}
    for r in rows:
        assert r["cost"] == min_by_part[r["p_partkey"]]


def test_q9_profit_grain_and_coverage(spark, sf_dir):
    """One row per (nation, year) and only years present in orders."""
    rows = tpch_q9_product_type_profit(spark, sf_dir).collect()
    assert rows
    keys = [(r["nation"], r["o_year"]) for r in rows]
    assert len(keys) == len(set(keys))
    years = {
        r["y"]
        for r in load_table(spark, sf_dir, "orders")
        .select(F.year("o_orderdate").alias("y"))
        .distinct()
        .collect()
    }
    assert {y for _, y in keys} <= years


def test_q11_threshold_filters_strictly(spark, sf_dir):
    """Every kept part's value exceeds 0.1% of the filtered total."""
    kept = tpch_q11_important_stock(spark, sf_dir).collect()
    assert kept
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(1, 3, 5)
    )
    total = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(9,2)")
            ).alias("t")
        )
        .collect()[0]["t"]
    )
    for r in kept:
        # value is ROUND(...,2): rounding moves it by up to 0.005, i.e.
        # up to 5 after the *1000 — the slack must cover that
        assert float(r["value"]) * 1000 > float(total) - 5.01


def test_q16_excludes_negative_balance_suppliers(spark, sf_dir):
    """supplier_cnt never counts a supplier from the exclusion list."""
    rows = tpch_q16_supplier_part_counts(spark, sf_dir).collect()
    assert rows
    n_supp = load_table(spark, sf_dir, "supplier").count()
    n_excluded = (
        load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).count()
    )
    assert all(0 < r["supplier_cnt"] <= n_supp - n_excluded for r in rows)


def test_q20_only_asia_suppliers(spark, sf_dir):
    """Output suppliers all sit in ASIA-region nations."""
    rows = tpch_q20_potential_part_promotion(spark, sf_dir).collect()
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = {
        r["n_name"]
        for r in nation.join(
            region, nation.n_regionkey == region.r_regionkey
        ).collect()
    }
    assert rows  # threshold chosen so sf0.001 already qualifies suppliers
    assert {r["n_name"] for r in rows} <= asia_nations
