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
