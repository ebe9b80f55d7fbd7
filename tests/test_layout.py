"""Physical-layout plan properties: bucketed joins are exchange-free,
partitioned layouts prune at scan time (sources/layout.py)."""

import os

import pytest
from pyspark.sql import functions as F

from beametrics_spark.sources import load_table
from beametrics_spark.sources.layout import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")

    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try:
        # force the join strategy decision away from broadcast so the
        # plan proves co-location, not small-table luck — at 100 TB
        # neither side of a fact-fact join broadcasts
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
            plan = plan_of(joined)
            assert "Exchange" not in plan, plan
            # same join WITHOUT bucketing shuffles both sides
            plain = orders.join(lineitem, "o_orderkey")
            assert "Exchange" in plan_of(plain)
            # correctness: bucketed result == plain result
            assert joined.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregation_has_no_exchange(spark):
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(lineitem, "b_li_agg", "l_orderkey", 8)
    try:
        agg = (
            spark.table("b_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert "Exchange" not in plan_of(agg), plan_of(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_by_source")
    write_partitioned(docs, out, ["source"])
    # a filter on the partition column must become a PartitionFilter and
    # read only that directory's files
    df = spark.read.parquet(out).filter(F.col("source") == "src3")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "src3" in plan
    n_total = docs.count()
    n_src3 = df.count()
    assert 0 < n_src3 < n_total
    # pruned scan lists only the matching partition directory
    dirs = [d for d in os.listdir(out) if d.startswith("source=")]
    assert len(dirs) > 1
