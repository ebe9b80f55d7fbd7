"""Engine-path queries for the extended window types (sliding, session).

These run THROUGH build_metrics_pipeline with MetricConfig.window_slide /
session_gap set, oracle-checked against window-function constructions in
DuckDB — proving the engine's windowing extensions, not just raw Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.config import FilterCondition, MetricConfig, MetricDefinition
from beametrics_spark.pipeline import build_metrics_pipeline
from beametrics_spark.functions import cents, e4_dollars
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table


@register(
    "ref_sliding_window_count",
    """
    WITH starts AS (
      SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT time_bucket(INTERVAL '60 seconds', ts) - INTERVAL '60 seconds'
      FROM events WHERE event_type = 'error'
    )
    SELECT window_start, CAST(count(*) AS DOUBLE) AS value
    FROM starts GROUP BY 1
    """,
)
def ref_sliding_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine pipeline with window_slide: 120 s windows hopping every 60 s —
    each error lands in two windows (the oracle enumerates both offsets)."""
    events = load_table(spark, sf_dir, "events")
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="sliding_errors", type="count"),
        filter_conditions=[FilterCondition("event_type", "error", "equals")],
        window_size=120,
        window_slide=60,
    )
    out = build_metrics_pipeline(events, [cfg])
    return out.select("window_start", F.col("value").alias("value"))


@register(
    "ref_session_window_sum",
    """
    WITH seq AS (
      SELECT event_type, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE event_type IN ('error', 'purchase')
      WINDOW w AS (PARTITION BY event_type ORDER BY ts)
    ),
    sess AS (
      SELECT event_type, ts, value,
             SUM(brk) OVER (PARTITION BY event_type ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    )
    SELECT event_type, min(ts) AS window_start,
           max(ts) + INTERVAL '1800 seconds' AS window_end,
           ROUND(SUM(value), 2) AS value
    FROM sess GROUP BY event_type, sid
    """,
)
def ref_session_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine pipeline with session_gap: gap-merged (30 min) sessions per
    event_type label, summing value. Spark's session_window start = first
    event, end = last event + gap — the oracle reconstructs the same
    sessions with lag/cumsum window functions."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "purchase")
    )
    cfg = MetricConfig(
        metric_definition=MetricDefinition(
            name="session_value",
            type="sum",
            field="value",
            dynamic_labels={"event_type": "event_type"},
        ),
        session_gap=1800,
    )
    out = build_metrics_pipeline(events, [cfg])
    return out.select(
        F.element_at("labels", "event_type").alias("event_type"),
        "window_start",
        "window_end",
        F.round("value", 2).alias("value"),
    )


@register(
    "timeseries_gap_fill",
    """
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS lo,
             time_bucket(INTERVAL '1 hour', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
      FROM bounds
    ),
    actual AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             count(*) AS n, ROUND(SUM(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, s.bucket,
           COALESCE(a.n, 0) AS n,
           COALESCE(a.total, 0.0) AS total
    FROM spine s
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    LEFT JOIN actual a ON a.event_type = t.event_type AND a.bucket = s.bucket
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample: every (event_type, hour) slot between
    the corpus bounds gets a row, zero-filled where no events landed — the
    regularized series a downstream forecaster or dashboard needs (a
    GROUP BY alone silently omits empty buckets).

    Scale shape: the spine is GENERATED with sequence()+explode from one
    global (min,max) row — no driver-side loop, no range table shipped
    from the driver; it broadcasts against the per-type aggregates, and
    the heavy side (raw events) is touched exactly once by the real
    aggregation. Bucket count = hours in range — bounded and tiny relative
    to the data regardless of SF."""
    events = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    actual = events.groupBy(
        "event_type", hour.alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    types = events.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(actual, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


@register(
    "timeseries_fill_forward",
    """
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS lo,
             time_bucket(INTERVAL '1 hour', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
      FROM bounds
    ),
    actual AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             ROUND(AVG(value), 4) AS avg_value
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, s.bucket, a.avg_value
      FROM spine s
      CROSS JOIN (SELECT DISTINCT event_type FROM events) t
      LEFT JOIN actual a ON a.event_type = t.event_type AND a.bucket = s.bucket
    )
    SELECT event_type, bucket,
           COALESCE(last_value(avg_value IGNORE NULLS)
                      OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING), 0.0) AS filled_value
    FROM grid
    """,
)
def timeseries_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill resample: hourly average value per event type with
    empty buckets carrying the last observation forward (leading gaps
    before the first observation fill with 0). The other canonical
    regularization besides zero-fill — what a metrics dashboard or a
    feature-engineering job does to sparse gauges.

    One window pass (partition per type, ordered by bucket) over the tiny
    grid — the raw events are only touched by the hourly aggregation; the
    fill itself costs |types| × |hours| rows regardless of SF."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    actual = events.groupBy("event_type", hour.alias("bucket")).agg(
        F.round(F.avg("value"), 4).alias("avg_value")
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    types = events.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types)).join(
        actual, ["event_type", "bucket"], "left"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "event_type",
        "bucket",
        F.coalesce(
            F.last("avg_value", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("filled_value"),
    )


@register(
    "hierarchical_time_rollup",
    """
    WITH minutely AS (
      SELECT date_trunc('minute', ts) AS bucket,
             count(*) AS n_events,
             SUM(CAST(value AS DECIMAL(18,2))) AS total_value
      FROM events GROUP BY 1
    ),
    hourly AS (
      SELECT date_trunc('hour', bucket) AS bucket,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             SUM(total_value) AS total_value
      FROM minutely GROUP BY 1
    ),
    daily AS (
      SELECT date_trunc('day', bucket) AS bucket,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             SUM(total_value) AS total_value
      FROM hourly GROUP BY 1
    )
    SELECT 'hour' AS resolution, bucket, n_events,
           CAST(ROUND(total_value, 2) AS DOUBLE) AS total_value
    FROM hourly
    UNION ALL
    SELECT 'day' AS resolution, bucket, n_events,
           CAST(ROUND(total_value, 2) AS DOUBLE) AS total_value
    FROM daily
    """,
)
def hierarchical_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution downsampling hierarchy (the TSDB continuous-
    aggregate pattern): minutely aggregates from raw, hourly from
    MINUTELY, daily from HOURLY — each coarser level re-aggregates the
    previous level's partials instead of rescanning raw events.

    At 100 TB this is the difference between one raw scan feeding a
    |minutes|-row cascade and three raw scans: the hourly and daily
    shuffles move thousands of pre-aggregated rows, not billions of
    events. count re-sums and exact integer-cent sums (functions.cents)
    re-sum exactly, so the cascade is bit-identical to direct
    aggregation at every level (the oracle computes the same chain in
    decimal). Spark reuses the minutely
    aggregate for both coarser levels within one plan.
    """
    events = load_table(spark, sf_dir, "events")
    minutely = events.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents(F.col("value"))).alias("total_value"),
    )
    hourly = minutely.groupBy(
        F.date_trunc("hour", F.col("bucket")).alias("bucket")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("bucket")).alias("bucket")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
    )

    def fmt(df, label):
        return df.select(
            F.lit(label).alias("resolution"),
            "bucket",
            F.col("n_events").cast("bigint").alias("n_events"),
            e4_dollars(F.col("total_value") * 100).alias("total_value"),
        )

    return fmt(hourly, "hour").unionAll(fmt(daily, "day"))
