"""SURVEY.md §2.3 declared query surface — the DuckDB-oracle set.

Every query here is built THROUGH the engine (`build_metrics_pipeline`),
not as ad-hoc DataFrame code, so the correctness gate exercises the real
fan-out → window → aggregate path the streaming deployment uses. The
oracle SQL strings live next to each builder so the pair stays in sync.

Conventions for oracle comparability (driver hashes values after sorting
columns by name):
  - every computed column aliased identically on both sides;
  - window starts exposed as `window_start` TIMESTAMP
    (Spark `window(ts,'60 seconds').start` ≡ DuckDB
    `time_bucket(INTERVAL '60 seconds', ts)` — both epoch-aligned);
  - double sums rounded to 2 decimals on both sides (input values have
    2-decimal precision, so rounding absorbs accumulation-order noise);
  - counts cast to DOUBLE: the engine computes count as sum-of-ones
    (reference pipeline.py:206-207), and the oracle mirrors it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.config import FilterCondition, MetricConfig, MetricDefinition
from beametrics_spark.pipeline import build_metrics_pipeline
from beametrics_spark.sources import load_table

from beametrics_spark.registry import register as _register

QueryFn = Callable[[SparkSession, str], DataFrame]


def _metric_points(
    spark: SparkSession,
    sf_dir: str,
    configs: list[MetricConfig],
    *,
    window_size: int = 60,
    label_cols: dict[str, str] | None = None,
    with_metric_id: bool = False,
    round_value: int | None = None,
) -> DataFrame:
    """Run the engine pipeline over events and project an oracle-comparable
    flat schema (label maps → named columns)."""
    events = load_table(spark, sf_dir, "events")
    out = build_metrics_pipeline(events, configs, window_size=window_size)
    cols = [F.col("window_start")]
    if with_metric_id:
        cols.append(F.col("metric_id").cast("int").alias("metric_id"))
    for col_name, label_key in (label_cols or {}).items():
        cols.append(F.element_at(F.col("labels"), label_key).alias(col_name))
    value = F.col("value")
    if round_value is not None:
        value = F.round(value, round_value)
    cols.append(value.alias("value"))
    return out.select(*cols)


# --- 1. equals filter + windowed count (§2.3 q1) ---------------------------


@_register(
    "ref_equals_count",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           CAST(count(*) AS DOUBLE) AS value
    FROM events WHERE event_type = 'error'
    GROUP BY 1
    """,
)
def ref_equals_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="error_count", type="count"),
        filter_conditions=[FilterCondition("event_type", "error", "equals")],
    )
    return _metric_points(spark, sf_dir, [cfg])


# --- 2. contains filter + windowed count (§2.3 q2) --------------------------


@_register(
    "ref_contains_count",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           CAST(count(*) AS DOUBLE) AS value
    FROM events WHERE position('ick' IN event_type) > 0
    GROUP BY 1
    """,
)
def ref_contains_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="click_count", type="count"),
        filter_conditions=[FilterCondition("event_type", "ick", "contains")],
    )
    return _metric_points(spark, sf_dir, [cfg])


# --- 3. greater_than / less_than + windowed count (§2.3 q3) -----------------


@_register(
    "ref_numeric_range_count",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           CAST(count(*) AS DOUBLE) AS value
    FROM events WHERE value > 100 AND value < 500
    GROUP BY 1
    """,
)
def ref_numeric_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="mid_values", type="count"),
        filter_conditions=[
            FilterCondition("value", 100, "greater_than"),
            FilterCondition("value", 500, "less_than"),
        ],
    )
    return _metric_points(spark, sf_dir, [cfg])


# --- 4. AND-composed mixed filter + count (§2.3 q4) --------------------------


@_register(
    "ref_multi_condition_count",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           CAST(count(*) AS DOUBLE) AS value
    FROM events WHERE event_type = 'purchase' AND value > 50
    GROUP BY 1
    """,
)
def ref_multi_condition_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="big_purchases", type="count"),
        filter_conditions=[
            FilterCondition("event_type", "purchase", "equals"),
            FilterCondition("value", 50, "greater_than"),
        ],
    )
    return _metric_points(spark, sf_dir, [cfg])


# --- 5. windowed sum (§2.3 q5) ----------------------------------------------


@_register(
    "ref_windowed_sum",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           ROUND(SUM(value), 2) AS value
    FROM events WHERE event_type = 'error'
    GROUP BY 1
    """,
)
def ref_windowed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="error_value_sum", type="sum", field="value"),
        filter_conditions=[FilterCondition("event_type", "error", "equals")],
    )
    return _metric_points(spark, sf_dir, [cfg], round_value=2)


# --- 6. grouped by dynamic labels (§2.3 q6) ----------------------------------
# label from a typed column (event_type) AND from schema-less props JSON
# ('$.k'), both coerced to string, missing ⇒ '' (pipeline.py:194-197).


@_register(
    "ref_grouped_labels",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           COALESCE(CAST(event_type AS VARCHAR), '') AS event_type,
           COALESCE(json_extract_string(props, '$.k'), '') AS k,
           CAST(count(*) AS DOUBLE) AS value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def ref_grouped_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(
            name="by_type_and_k",
            type="count",
            dynamic_labels={"event_type": "event_type", "k": "k"},
        ),
    )
    return _metric_points(
        spark, sf_dir, [cfg], label_cols={"event_type": "event_type", "k": "k"}
    )


# --- 7. multi-metric fan-out (§2.3 q7) ----------------------------------------


@_register(
    "ref_multi_metric_fanout",
    """
    SELECT CAST(0 AS INT) AS metric_id,
           time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           CAST(count(*) AS DOUBLE) AS value
    FROM events WHERE event_type = 'error' GROUP BY 2
    UNION ALL
    SELECT CAST(1 AS INT) AS metric_id,
           time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           ROUND(SUM(value), 2) AS value
    FROM events WHERE value > 100 GROUP BY 2
    """,
)
def ref_multi_metric_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfgs = [
        MetricConfig(
            metric_definition=MetricDefinition(name="error_count", type="count"),
            filter_conditions=[FilterCondition("event_type", "error", "equals")],
        ),
        MetricConfig(
            metric_definition=MetricDefinition(name="big_value_sum", type="sum", field="value"),
            filter_conditions=[FilterCondition("value", 100, "greater_than")],
        ),
    ]
    return _metric_points(spark, sf_dir, cfgs, with_metric_id=True, round_value=2)


# --- 8. missing-field semantics (§2.3 q8) --------------------------------------
# sum over a field absent everywhere ⇒ contributes 0 per row; dynamic label
# over a missing field ⇒ '' (pipeline.py:195,208).


@_register(
    "ref_missing_field_sum",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           '' AS absent_label,
           ROUND(SUM(COALESCE(TRY_CAST(json_extract_string(props, '$.absent') AS DOUBLE), 0)), 2) AS value
    FROM events
    GROUP BY 1
    """,
)
def ref_missing_field_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(
            name="absent_sum",
            type="sum",
            field="absent",
            dynamic_labels={"absent_label": "absent"},
        ),
    )
    return _metric_points(
        spark, sf_dir, [cfg], label_cols={"absent_label": "absent_label"}, round_value=2
    )


# --- 9. match-all (empty filter) count (§2.3 q9) --------------------------------


@_register(
    "ref_match_all_count",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           CAST(count(*) AS DOUBLE) AS value
    FROM events GROUP BY 1
    """,
)
def ref_match_all_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="all_events", type="count"),
    )
    return _metric_points(spark, sf_dir, [cfg])


# --- 10. malformed-JSON drop (§2.3 q10) -------------------------------------------
# A query reading a field out of `props` excludes rows whose JSON does not
# parse (reference DecodeAndParse drop, pipeline.py:102-108): the dynamic
# field resolves to NULL for bad JSON, so a numeric predicate drops the row.


@_register(
    "ref_json_field_count",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           CAST(count(*) AS DOUBLE) AS value
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) > -1
    GROUP BY 1
    """,
)
def ref_json_field_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="parsed_props", type="count"),
        filter_conditions=[FilterCondition("k", -1, "greater_than")],
    )
    return _metric_points(spark, sf_dir, [cfg])
