"""functions/ helpers: salted aggregation correctness + time_bucket,
plans/ helpers sanity."""

import pytest
from pyspark.sql import functions as F

from beametrics_spark.functions import salted_aggregate, time_bucket
from beametrics_spark.plans import (
    exchanges,
    pushed_filters,
    scan_count,
    uses_hash_aggregate,
)
from beametrics_spark.sources import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"], r["n"], round(r["total"], 6), r["mx"])
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["event_type"], r["n"], round(r["total"], 6), r["mx"])
        for r in salted_aggregate(
            events,
            ["event_type"],
            {
                "n": F.count(F.lit(1)),
                "total": F.sum("value"),
                "mx": F.max("value"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_spreads_hot_key(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)], "k string, v double"
    )
    out = salted_aggregate(
        df, ["k"], {"total": F.sum("v"), "n": F.count(F.lit(1))}, salt_buckets=4
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 1000 and rows[0]["total"] == sum(range(1000))
    # two-phase plan: at least two aggregation exchanges
    assert len(exchanges(out)) >= 2


def test_salted_aggregate_rejects_non_algebraic(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(df, ["k"], {"a": F.avg("v")})


def test_time_bucket_matches_window(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(200)
    both = events.select(
        time_bucket(F.col("ts"), 300).alias("b"),
        F.window("ts", "300 seconds").start.alias("w"),
    )
    assert both.filter(F.col("b") != F.col("w")).count() == 0


def test_plan_helpers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "A"
    ).groupBy("l_linestatus").agg(F.sum("l_quantity").alias("q"))
    assert scan_count(li) == 1
    assert uses_hash_aggregate(li)
    assert any("l_returnflag" in f for f in pushed_filters(li))


def test_guard_quadratic_blocks_and_allows(spark):
    from beametrics_spark.functions import guard_quadratic

    small = spark.range(10)
    # within bounds: passthrough
    assert guard_quadratic(small, "small", scale_path="lsh").count() == 10

    big = spark.range(500)
    with pytest.raises(ValueError, match="refusing O"):
        guard_quadratic(big, "big", scale_path="lsh", limit=100)
    # explicit override skips even the count
    assert guard_quadratic(
        big, "big", scale_path="lsh", limit=100, allow_quadratic=True
    ).count() == 500


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salted join returns exactly the plain join's rows — only the
    shuffle distribution differs."""
    from beametrics_spark.functions import salted_join
    from beametrics_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plain = orders.join(li, "o_orderkey")
    salted = salted_join(orders, li, "o_orderkey", salt_buckets=8)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_salted_join_spreads_hot_key(spark):
    """A 10k-row hot key must land in multiple salt buckets, and the join
    key of the exchange must include the salt column."""
    from beametrics_spark.functions import salted_join

    hot = spark.range(10000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, name string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(hot, dim, "k", salt_buckets=8)
        assert out.count() == 10000
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan  # the exchange partitions on (k, _salt)
        # distribution check: the hot key's rows hash into >1 salt bucket
        salts = (
            hot.withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64(
                        F.concat_ws(
                            "\x02", *[F.col(c).cast("string") for c in hot.columns]
                        )
                    ),
                    F.lit(8),
                ),
            )
            .select("_salt")
            .distinct()
            .count()
        )
        assert salts == 8
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    from beametrics_spark.functions import salted_join

    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full")


def test_salting_rejects_existing_salt_column(spark):
    import pytest

    from beametrics_spark.functions import salted_aggregate, salted_join
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 2)], "k long, _salt long")
    clean = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="_salt"):
        salted_aggregate(df, ["k"], {"n": F.count(F.lit(1))})
    with pytest.raises(ValueError, match="_salt"):
        salted_join(df, clean, "k")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(clean, df, "k")
