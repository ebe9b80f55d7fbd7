"""Profiling operator invariants. Full value parity runs through
scripts/oracle_check.py (both queries have DuckDB oracles)."""

from pyspark.sql import functions as F

from beametrics_spark.operators.profiling import (
    key_skew_profile,
    table_profile,
    table_profile_orders,
)
from beametrics_spark.sources import load_table


def test_key_skew_profile_ordering_and_ratio(spark, sf_dir):
    rows = key_skew_profile(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    counts = [r["n_rows"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    li = load_table(spark, sf_dir, "lineitem")
    n_keys = li.select("l_orderkey").distinct().count()
    total = li.count()
    top = rows[0]
    assert abs(top["skew_ratio"] - round(top["n_rows"] * n_keys / total, 4)) < 1e-9
    assert all(r["skew_ratio"] >= 1.0 for r in rows)  # hottest ≥ mean


def test_table_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "k int, s string"
    )
    out = {r["column_name"]: r for r in table_profile(df, ["k", "s"]).collect()}
    assert out["k"]["n_rows"] == 4
    assert out["k"]["n_nulls"] == 1
    assert out["k"]["n_distinct"] == 2
    assert (out["k"]["min_value"], out["k"]["max_value"]) == ("1", "2")
    assert out["s"]["n_nulls"] == 1
    assert out["s"]["n_distinct"] == 2
    assert (out["s"]["min_value"], out["s"]["max_value"]) == ("a", "b")


def test_table_profile_orders_shape(spark, sf_dir):
    rows = table_profile_orders(spark, sf_dir).collect()
    assert len(rows) == 4
    n = load_table(spark, sf_dir, "orders").count()
    assert all(r["n_rows"] == n for r in rows)
    assert all(r["n_nulls"] == 0 for r in rows)  # synthetic data is complete


def test_table_profile_null_handling(spark):
    """Nulls count into n_nulls, stay out of n_distinct/min/max; numeric
    columns order numerically (the '9999' > '14999' lexical trap)."""
    from beametrics_spark.operators.profiling import table_profile

    df = spark.createDataFrame(
        [(14999, "b"), (9999, None), (None, "a"), (9999, "c")],
        "k int, s string",
    )
    rows = {r["column_name"]: r for r in table_profile(df, ["k", "s"]).collect()}
    k, s = rows["k"], rows["s"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 1, 2)
    assert (k["min_value"], k["max_value"]) == ("9999", "14999")
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (4, 1, 3)
    assert (s["min_value"], s["max_value"]) == ("a", "c")


def test_referential_integrity_no_orphans_in_testdata(spark, sf_dir):
    from beametrics_spark.operators.profiling import referential_integrity_audit

    rows = {r["fk"]: r for r in referential_integrity_audit(spark, sf_dir).collect()}
    assert len(rows) == 4
    # driver testdata is referentially clean — every FK resolves
    for r in rows.values():
        assert r["n_orphans"] == 0
        assert r["n_rows"] > 0


def test_referential_integrity_detects_planted_orphans(spark):
    import beametrics_spark.operators.profiling as prof

    orders = spark.createDataFrame(
        [(1, 10), (2, 99)], ["o_orderkey", "o_custkey"]  # 99 is orphaned
    )
    customer = spark.createDataFrame([(10,)], ["c_custkey"])
    lineitem = spark.createDataFrame(
        [(1, 5, 7), (3, 5, 7)], ["l_orderkey", "l_partkey", "l_suppkey"]
    )  # l_orderkey=3 orphaned
    part = spark.createDataFrame([(5,)], ["p_partkey"])
    supplier = spark.createDataFrame([(7,)], ["s_suppkey"])
    tables = {"orders": orders, "customer": customer, "lineitem": lineitem,
              "part": part, "supplier": supplier}
    orig = prof.load_table
    try:
        prof.load_table = lambda spark, sf_dir, name: tables[name]
        rows = {r["fk"]: r["n_orphans"]
                for r in prof.referential_integrity_audit(spark, "x").collect()}
    finally:
        prof.load_table = orig
    assert rows["orders.o_custkey -> customer"] == 1
    assert rows["lineitem.l_orderkey -> orders"] == 1
    assert rows["lineitem.l_partkey -> part"] == 0
    assert rows["lineitem.l_suppkey -> supplier"] == 0


def test_table_profile_nan_is_not_null(spark):
    """A double NaN formats to NULL through the DECIMAL render but is NOT
    a null: it must count as a present distinct value (raw-column null
    semantics), while a real NULL counts in n_nulls only."""
    from beametrics_spark.operators.profiling import table_profile

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (None,), (2.0,)], "x double"
    )
    row = table_profile(df, ["x"], round_cols={"x": 2}).collect()[0]
    assert row["n_rows"] == 4
    assert row["n_nulls"] == 1          # only the real NULL
    assert row["n_distinct"] == 3       # 1.0, NaN, 2.0
