"""Scale-pattern operators: semantics the oracle can't see — the bucket
pre-filter being a pure reduction (same result as the plain semi join),
the Morton interleave bit math, Z-order-vs-linear pruning shape, and
heavy-hitter exactness under arbitrary partitioning (the pigeonhole
candidate guarantee). Value parity vs DuckDB runs in oracle_check."""

import pytest
from pyspark.sql import functions as F

from beametrics_spark.operators.scale_patterns import (
    _BLOOM_BUCKETS,
    _HH_DEN,
    _HH_NUM,
    _interleave_bits,
    bloom_prefilter_semi_revenue,
    heavy_hitters_exact_twopass,
    zorder_layout_pruning_audit,
)
from beametrics_spark.sources import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- bloom pre-filter --------------------------------------------------------


def test_bloom_prefilter_equals_plain_semi_join(spark, sf_dir):
    """The bucket stage may only REMOVE non-matching rows; collisions
    that survive it must be killed by the exact join, so the operator
    must be row-identical to the un-prefiltered formulation."""
    got = {
        r.l_returnflag: (r.revenue, r.n_items)
        for r in bloom_prefilter_semi_revenue(spark, sf_dir).collect()
    }

    orders = load_table(spark, sf_dir, "orders")
    keys = orders.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(keys, "l_orderkey", "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    want = {r.l_returnflag: (r.revenue, r.n_items) for r in plain.collect()}
    assert set(got) == set(want)
    for flag in want:
        assert got[flag][1] == want[flag][1]
        assert got[flag][0] == pytest.approx(want[flag][0], abs=0.02)


def test_bloom_bucket_stage_is_broadcast(spark, sf_dir):
    """The bucket set (<= _BLOOM_BUCKETS rows by construction) must join
    broadcast, never shuffle — that is the entire point of the stage."""
    plan = plan_of(bloom_prefilter_semi_revenue(spark, sf_dir))
    assert plan.count("LeftSemi") >= 2  # bucket prefilter + exact join
    assert "BroadcastHashJoin" in plan
    assert _BLOOM_BUCKETS <= 1 << 20  # broadcast payload stays MB-scale


def test_bloom_bucket_prefilter_reduces_scan(spark, sf_dir):
    """Occupancy sanity: the bucket set covers < 100% of buckets at test
    SF, so the prefilter passes fewer rows than the raw table (i.e. it
    actually filters, rather than degenerating to a no-op)."""
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    ).select("o_orderkey")
    n_buckets = (
        keys.select(
            F.pmod(F.xxhash64("o_orderkey"), F.lit(_BLOOM_BUCKETS)).alias("b")
        )
        .distinct()
        .count()
    )
    # occupancy must stay low enough that the prefilter actually filters
    # (a near-full bitmap passes everything) — the sizing rule documented
    # on _BLOOM_BUCKETS targets single-digit-percent occupancy at test SF
    assert 0 < n_buckets < _BLOOM_BUCKETS // 10


# --- Z-order layout ----------------------------------------------------------


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(0xFF, 0x00), (0x00, 0xFF), (0xFF, 0xFF), (0b101, 0b011)],
        "xb int, yb int",
    ).select(_interleave_bits(F.col("xb"), F.col("yb")).alias("z"))
    got = [r.z for r in df.collect()]
    # x fills even bit positions, y fills odd ones
    assert got == [0x5555, 0xAAAA, 0xFFFF, 0b011011]


def test_zorder_prunes_both_dims_linear_only_one(spark, sf_dir):
    rows = {r.layout: r for r in zorder_layout_pruning_audit(spark, sf_dir).collect()}
    z, lin = rows["zorder"], rows["linear"]
    # Linear layout barely prunes the non-sort dimension (at tiny SF a
    # sparse file's min-stat can exceed the range by luck, so "almost
    # none" rather than exactly zero pruning):
    assert lin.cust_pred_files >= lin.files_nonempty * 3 // 4
    # but prunes its own sort dimension hard (1/8-range predicate):
    assert lin.day_pred_files <= lin.files_nonempty // 4
    # Z-order prunes BOTH dimensions:
    assert z.day_pred_files <= z.files_nonempty // 4
    assert z.cust_pred_files <= z.files_nonempty // 4
    assert z.cust_pred_files < lin.cust_pred_files


def test_zorder_audit_has_no_sort_or_window(spark, sf_dir):
    """The audit is two hash aggregations — a global sort (ntile-style
    file assignment) would be the anti-pattern at 100 TB."""
    plan = plan_of(zorder_layout_pruning_audit(spark, sf_dir))
    assert "Sort" not in plan.replace("SortMergeJoin", "")
    assert "Window" not in plan


# --- heavy hitters -----------------------------------------------------------


def _write_lineitem(spark, path, counts: dict[int, int], partitions: int):
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "l_partkey long").repartition(partitions)
    df.write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


@pytest.mark.parametrize("partitions", [1, 3, 8])
def test_heavy_hitters_exact_any_partitioning(spark, tmp_path, partitions):
    """Candidate sets differ per partitioning; the OUTPUT may not. A key
    at exactly the threshold (count*DEN == NUM*N) is included; one unit
    below is excluded."""
    # N = 4000 -> global threshold = ceil(3*4000/4000) = 3 occurrences
    counts = {1: 3, 2: 2, 3: 3980, 4: 1, 5: 14}
    assert sum(counts.values()) == 4000
    _write_lineitem(spark, tmp_path, counts, partitions)
    got = {
        r.l_partkey: r.cnt
        for r in heavy_hitters_exact_twopass(spark, str(tmp_path)).collect()
    }
    want = {k: c for k, c in counts.items() if c * _HH_DEN >= _HH_NUM * 4000}
    assert got == want
    assert 1 in got and 2 not in got  # exact threshold boundary


def test_heavy_hitters_matches_bruteforce_on_testdata(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    n = li.count()
    brute = {
        r.l_partkey: r.cnt
        for r in li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * _HH_DEN >= _HH_NUM * n)
        .collect()
    }
    got = {
        r.l_partkey: r.cnt
        for r in heavy_hitters_exact_twopass(spark, sf_dir).collect()
    }
    assert got == brute


def test_heavy_hitters_recheck_join_is_broadcast(spark, sf_dir):
    plan = plan_of(heavy_hitters_exact_twopass(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
