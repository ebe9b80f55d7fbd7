"""Event-sequence analytics + dataset splitting — batch operators over
the `events` and `documents` tables that round out the engine's
product-analytics and corpus-preparation surface.

- Funnel conversion: ordered-stage progression per user
  (view → click → purchase), the canonical event-sequence query every
  product-analytics engine ships. Formulated as per-user conditional
  MIN timestamps — one shuffle on user_id, a row-local stage
  comparison, and a single-row rollup; no self-joins, no UDFs, no
  per-user event arrays (the naive collect_list formulation holds a
  user's whole history in one row — unbounded at 100 TB).
- Train/val/test split: deterministic md5 assignment (90/5/5) with
  per-source split counts — the reproducible-holdout primitive every
  training-corpus build needs. Same portable-hash core as
  sample_stratified_hash / domain_rebalance_sample; the assignment is
  a pure row function, so re-runs, engine swaps, and repartitioning
  cannot move a document between splits.

The reference has none of this (SURVEY.md §2.2); these extend the M7
scope (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table


@register(
    "funnel_conversion",
    """
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS reached_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase
    FROM stages
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: a user advances to a stage only if
    its FIRST occurrence is strictly after the first occurrence of the
    previous stage (NULL comparisons are false in both engines, so a
    missing stage never counts).

    Plan shape: conditional-MIN pre-aggregation per user (partial
    map-side combine → one shuffle on user_id), then a scalar rollup.
    The per-user state is three timestamps regardless of history length
    — bounded at any scale, unlike sequence-array formulations.
    """
    events = load_table(spark, sf_dir, "events")

    def first_ts(stage: str):
        return F.min(F.when(F.col("event_type") == stage, F.col("ts")))

    stages = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    saw_view = F.col("t_view").isNotNull()
    clicked = saw_view & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(saw_view.cast("long")).alias("reached_view"),
        F.sum(clicked.cast("long")).alias("reached_click"),
        F.sum(purchased.cast("long")).alias("reached_purchase"),
    )


@register(
    "dataset_split_assign",
    """
    WITH assigned AS (
      SELECT source,
             CASE
               WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT % 100 < 90
                 THEN 'train'
               WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT % 100 < 95
                 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT source, split, COUNT(*) AS n_docs
    FROM assigned
    GROUP BY source, split
    """,
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment from a 60-bit md5
    of doc_id, rolled up per (source, split).

    The split is a pure function of the document id: adding data,
    re-partitioning, or re-running never moves an existing document
    between splits (the property that keeps eval sets uncontaminated as
    a corpus grows). Narrow projection, one tiny agg shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    from beametrics_spark.operators.dedup import md5_hash60

    bucket = F.pmod(md5_hash60(F.col("doc_id").cast("string")), F.lit(100))
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "value_clip_rates",
    """
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(quantile_cont(value, 0.01), 6) AS p01,
             ROUND(quantile_cont(value, 0.99), 6) AS p99
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, s.n, s.p01, s.p99,
           CAST(SUM(CASE WHEN e.value < s.p01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(SUM(CASE WHEN e.value > s.p99 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above,
           ROUND(CAST(SUM(CASE WHEN e.value < s.p01 OR e.value > s.p99
                          THEN 1 ELSE 0 END) AS DOUBLE) / s.n, 6)
             AS clip_rate
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY s.event_type, s.n, s.p01, s.p99
    """,
)
def value_clip_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-screening rates per event type: exact p01/p99 of value and
    how many events a [p01, p99] clip would touch — the value-clipping /
    winsorization audit a feature pipeline runs before normalization.

    Deliberately percentile-based rather than z-score: exact percentiles
    are SORT-derived and therefore bit-deterministic in both engines,
    while mean/stddev over doubles depend on parallel summation order —
    a |z| > 3 cutoff could flip a boundary event between engines (or
    between partitionings). Same two-phase shape at 100 TB: a
    |event_type|-row stats table broadcasts back onto one scan of
    events; exact percentiles at that scale would swap in the
    approx-sketch twin (value_quantiles_per_type's pattern).
    """
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.01)"), 6).alias("p01"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )
    joined = events.select("event_type", "value").join(
        F.broadcast(stats), "event_type"
    )
    below = (F.col("value") < F.col("p01")).cast("long")
    above = (F.col("value") > F.col("p99")).cast("long")
    return (
        joined.groupBy("event_type", "n", "p01", "p99")
        .agg(
            F.sum(below).alias("n_below"),
            F.sum(above).alias("n_above"),
            F.round(
                F.sum(below + above).cast("double") / F.col("n"), 6
            ).alias("clip_rate"),
        )
        .select(
            "event_type", "n", "p01", "p99", "n_below", "n_above", "clip_rate"
        )
    )
