"""Physical data-layout utilities: bucketed tables and partitioned writes.

These are the two levers that remove the dominant costs of a 100 TB job
*before* any query runs:

  * **Bucketing** pre-shuffles a table once at write time. Two tables
    bucketed on the same key with the same bucket count join with ZERO
    exchanges — for a fact-fact join (lineitem ⋈ orders at 100 TB, both
    far above broadcast range) that's the difference between re-shuffling
    terabytes per query and none.
  * **Partitioned layout** (hive-style dirs) turns time/category filters
    into partition PRUNING: the scan never opens non-matching files, so a
    one-day query over a year of data reads ~1/365th of the bytes.

The reference has no storage layer at all (SURVEY.md §2.2 — Pub/Sub in,
Monitoring out), so this module is engine-side infrastructure for the
large-scale extension, exercised by tests/test_layout.py which pins the
no-exchange and partition-pruning plan shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize `df` as a bucketed (and bucket-sorted) parquet table.

    Bucket files are hash-partitioned by `bucket_col` at write time;
    `sort=True` additionally sorts within each bucket so downstream
    sort-merge joins skip their sort as well. Spark's session catalog
    keeps the bucketing metadata — joins/aggregations on `bucket_col`
    between same-bucketed tables plan with no Exchange.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs this is exchange-free: each task reads
    bucket i of both sides and joins locally — co-located by layout, not
    by runtime shuffle.
    """
    return spark.table(left_table).join(spark.table(right_table), on)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], *, mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout (`col=value/` directories).

    Filters on `partition_cols` become PartitionFilters at scan time —
    pruned directories are never listed into the file index, let alone
    read. Choose low-cardinality columns (date, source, lang); high-
    cardinality partitioning creates a small-file explosion instead.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def bucketed_vs_flat_demo(spark: SparkSession, sf_dir: str, table_prefix: str):
    """Build the shared bucketed-vs-flat join-aggregate demo used by both
    bench.py (timings) and scripts/plan_report.py (plan audit), so the
    two artifacts always describe the SAME experiment.

    Returns (bucketed_df, flat_df, cleanup) — the same
    `orders ⋈ lineitem ON o_orderkey → groupBy(o_orderkey)` over
    16-bucket catalog tables vs flat parquet. Caller is responsible for
    disabling broadcast around plan/timing reads and must call
    cleanup() when done.
    """
    from pyspark.sql import functions as F

    from beametrics_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    b_orders = f"{table_prefix}_b_orders"
    b_li = f"{table_prefix}_b_lineitem"
    write_bucketed(orders, b_orders, "o_orderkey", 16)
    write_bucketed(li, b_li, "o_orderkey", 16)

    def agg(df):
        return df.groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("qty"), F.first("o_totalprice").alias("price")
        )

    def cleanup():
        spark.sql(f"DROP TABLE IF EXISTS {b_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {b_li}")

    return agg(bucketed_join(spark, b_orders, b_li, "o_orderkey")), agg(
        orders.join(li, "o_orderkey")
    ), cleanup
