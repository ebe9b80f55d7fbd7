"""Event-sequence + dataset-split invariants. Full value parity runs
through scripts/oracle_check.py (both queries have DuckDB oracles)."""

from pyspark.sql import functions as F

from beametrics_spark.operators.events_ext import (
    dataset_split_assign,
    funnel_conversion,
)
from beametrics_spark.sources import load_table


def test_funnel_is_monotone_and_covers_users(spark, sf_dir):
    """Each stage's count is ≤ the previous stage's (funnel property),
    and n_users equals the distinct user count."""
    (row,) = funnel_conversion(spark, sf_dir).collect()
    users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert row["n_users"] == users
    assert row["n_users"] >= row["reached_view"] >= row["reached_click"] >= row["reached_purchase"]
    assert row["reached_view"] > 0


def test_funnel_requires_strict_ordering(spark, sf_dir):
    """Cross-check one converted cohort member by hand: the first click
    must be after the first view, first purchase after first click."""
    events = load_table(spark, sf_dir, "events")
    stages = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    )
    manual = stages.filter(
        F.col("v").isNotNull() & (F.col("c") > F.col("v")) & (F.col("p") > F.col("c"))
    ).count()
    (row,) = funnel_conversion(spark, sf_dir).collect()
    assert row["reached_purchase"] == manual


def test_dataset_split_partitions_and_reproduces(spark, sf_dir):
    """Splits partition each source exactly (no doc lost or duplicated),
    ratios roughly 90/5/5, and assignment reproduces bit-for-bit."""
    rows = dataset_split_assign(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals: dict = {}
    split_mass: dict = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        totals[r["source"]] = totals.get(r["source"], 0) + r["n_docs"]
        split_mass[r["split"]] += r["n_docs"]
    assert totals == per_source
    n = sum(split_mass.values())
    assert split_mass["train"] / n > 0.8  # 90% nominal, small-sample slack
    assert (
        {(r["source"], r["split"], r["n_docs"]) for r in rows}
        == {(r["source"], r["split"], r["n_docs"])
            for r in dataset_split_assign(spark, sf_dir).collect()}
    )
