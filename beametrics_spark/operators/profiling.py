"""Data profiling operators — the observability half of running joins
and aggregations at 100 TB.

- Key-skew profile: per join key, the hottest values and the skew ratio
  (hottest / mean rows-per-key). This is the number that decides
  whether a planned join needs salting (functions.salted_join), AQE
  skew splitting, or nothing — measured, not guessed.
- Table profile: per-column null fraction, distinct count, min/max —
  the Deequ-style completeness/cardinality snapshot a pipeline asserts
  on before promoting a new corpus drop.

Both are single-scan aggregations (the profile shuffles carry per-key
or per-column partials, never rows), so profiling a 100 TB table costs
one pass — cheap enough to run on every ingest.

The reference has no profiling surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

TOP_KEYS = 10


@register(
    "key_skew_profile",
    f"""
    WITH per_key AS (
      SELECT l_orderkey AS key, COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    stats AS (
      SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM per_key
    )
    SELECT p.key, p.n_rows,
           ROUND(CAST(p.n_rows AS DOUBLE) * s.n_keys / s.total, 4)
             AS skew_ratio
    FROM per_key p, stats s
    ORDER BY p.n_rows DESC, p.key ASC
    LIMIT {TOP_KEYS}
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hottest join-key values of lineitem.l_orderkey with each one's
    skew ratio (rows-for-this-key ÷ mean rows-per-key).

    A ratio near 1 means a uniform key (shuffle partitions evenly); a
    ratio of 1000 means one reducer holds 1000x the average and the
    join wants salting or AQE skew handling. One scan, one count
    aggregate, a scalar broadcast, and a top-k — profiling cost stays
    O(|keys|) after the map-side combine regardless of table size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = per_key.agg(
        F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        per_key.join(F.broadcast(stats))
        .select(
            "key",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") * F.col("n_keys") / F.col("total"), 4
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(TOP_KEYS)
    )


@register(
    "table_profile_orders",
    """
    SELECT 'o_orderkey' AS column_name,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR),
           CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column profile of `orders`: null count, exact distinct
    count, min/max per column — one row per profiled column.

    Built generically by table_profile(); Spark evaluates all columns'
    aggregates in a single scan (one wide aggregate per column batch),
    with values stringified so heterogeneous column types share one
    output schema. min/max of doubles are rounded to match the oracle's
    text rendering.
    """
    orders = load_table(spark, sf_dir, "orders")
    return table_profile(
        orders,
        ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
        round_cols={"o_totalprice": 2},
    )


def table_profile(
    df: DataFrame, columns: list[str], *, round_cols: dict[str, int] | None = None
) -> DataFrame:
    """Generic per-column profile: (column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value), one output row per column.

    Each column's aggregates run in one scan pass; the per-column
    aggregate frames are unioned (|columns| one-row frames — plan width
    grows with the profile, data volume does not).
    """
    round_cols = round_cols or {}
    parts = []
    for c in columns:
        col = F.col(c)
        lo, hi = F.min(col), F.max(col)
        if c in round_cols:
            lo = F.round(lo, round_cols[c])
            hi = F.round(hi, round_cols[c])
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
                F.count_distinct(col).alias("n_distinct"),
                lo.cast("string").alias("min_value"),
                hi.cast("string").alias("max_value"),
            ).select(F.lit(c).alias("column_name"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
