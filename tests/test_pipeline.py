"""In-pipeline aggregation semantics, ported from the reference's
tests/test_pipeline.py (count=2 / sum=250 scenarios, label merge,
missing-field defaults — SURVEY.md §5)."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from beametrics_spark.config import ExporterConfig, FilterCondition, MetricConfig, MetricDefinition
from beametrics_spark.pipeline import build_metrics_pipeline

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("severity", T.StringType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("region", T.StringType()),
        T.StructField("props", T.StringType()),
    ]
)

T0 = datetime(2024, 1, 1, 0, 0, 30)

ROWS = [
    (T0, "ERROR", 100, "us", "{}"),
    (T0, "ERROR", 150, None, "{}"),
    (T0, "INFO", 200, "eu", "{}"),
]


@pytest.fixture(scope="module")
def logs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def run(logs, configs, **kw):
    rows = build_metrics_pipeline(logs, configs, **kw).collect()
    return [r.asDict(recursive=True) for r in rows]


def test_filtered_count(logs):
    # reference tests/test_pipeline.py:119-145 — ERROR count == 2
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="error_count", type="count"),
        filter_conditions=[FilterCondition("severity", "ERROR", "equals")],
    )
    out = run(logs, [cfg])
    assert len(out) == 1
    assert out[0]["value"] == 2.0
    assert out[0]["metric_name"] == "error_count"
    assert out[0]["window_start"] == datetime(2024, 1, 1, 0, 0, 0)
    assert out[0]["window_end"] == datetime(2024, 1, 1, 0, 1, 0)


def test_filtered_sum(logs):
    # reference tests/test_pipeline.py:148-178 — ERROR bytes sum == 250
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="bytes_sum", type="sum", field="bytes"),
        filter_conditions=[FilterCondition("severity", "ERROR", "equals")],
    )
    out = run(logs, [cfg])
    assert len(out) == 1 and out[0]["value"] == 250.0


def test_sum_missing_field_contributes_zero(logs):
    # reference pipeline.py:208 — float(msg.get(field, 0))
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="s", type="sum", field="nonexistent"),
    )
    out = run(logs, [cfg])
    assert len(out) == 1 and out[0]["value"] == 0.0


def test_label_merge_dynamic_wins_and_missing_empty(logs):
    # reference pipeline.py:188-198: dynamic labels override static;
    # missing dynamic field ⇒ ""
    cfg = MetricConfig(
        metric_definition=MetricDefinition(
            name="c",
            type="count",
            metric_labels={"service": "api", "region": "static"},
            dynamic_labels={"region": "region"},
        ),
        filter_conditions=[FilterCondition("severity", "ERROR", "equals")],
    )
    out = run(logs, [cfg])
    labels = {frozenset(o["labels"].items()) for o in out}
    assert frozenset({("service", "api"), ("region", "us")}.union(set())) in labels
    assert frozenset({("service", "api"), ("region", "")}) in labels  # null region ⇒ ""


def test_multi_metric_fanout(logs):
    cfgs = [
        MetricConfig(
            metric_definition=MetricDefinition(name="error_count", type="count"),
            filter_conditions=[FilterCondition("severity", "ERROR", "equals")],
        ),
        MetricConfig(
            metric_definition=MetricDefinition(name="all_bytes", type="sum", field="bytes"),
        ),
    ]
    out = run(logs, cfgs)
    by_id = {o["metric_id"]: o for o in out}
    assert by_id[0]["value"] == 2.0
    assert by_id[1]["value"] == 450.0


def test_monitoring_prefix_in_output(logs):
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="error_count", type="count"),
        exporter=ExporterConfig(export_type="google-cloud-monitoring"),
    )
    out = run(logs, [cfg])
    assert out[0]["metric_name"] == "custom.googleapis.com/error_count"


def test_heterogeneous_window_sizes(logs):
    cfgs = [
        MetricConfig(
            metric_definition=MetricDefinition(name="m60", type="count"),
            window_size=60,
        ),
        MetricConfig(
            metric_definition=MetricDefinition(name="m120", type="count"),
            window_size=120,
        ),
    ]
    out = run(logs, cfgs)
    by_id = {o["metric_id"]: o for o in out}
    assert by_id[0]["window_end"] == datetime(2024, 1, 1, 0, 1, 0)
    assert by_id[1]["window_end"] == datetime(2024, 1, 1, 0, 2, 0)
    assert by_id[0]["value"] == 3.0 and by_id[1]["value"] == 3.0


def test_label_cardinality_guard(spark, sf_dir):
    """SURVEY §4.3: an unbounded dynamic label must be cappable."""
    from beametrics_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    uncapped = MetricConfig(
        metric_definition=MetricDefinition(
            name="u", type="count", dynamic_labels={"user": "user_id"}
        ),
    )
    capped = MetricConfig(
        metric_definition=MetricDefinition(
            name="c",
            type="count",
            dynamic_labels={"user": "user_id"},
            label_cardinality_cap=5,
        ),
    )
    out = build_metrics_pipeline(events, [uncapped, capped], window_size=10**9)
    labels = {}
    total = {}
    for r in out.collect():
        labels.setdefault(r["metric_id"], set()).add(r["labels"]["user"])
        total[r["metric_id"]] = total.get(r["metric_id"], 0) + r["value"]
    assert len(labels[0]) > 5  # raw user cardinality
    assert len(labels[1]) <= 5  # guard bounds the domain
    assert all(v.startswith("b") for v in labels[1])
    assert total[0] == total[1]  # no events lost, only re-bucketed


def test_salted_aggregate_windows_matches_plain(spark, sf_dir):
    """Opt-in salted two-phase windowed aggregation (the SURVEY §4.3
    hot-label-set scenario): identical output to the plain path, with the
    salted plan pinned (two aggregation exchanges, _salt in the keys)."""
    from beametrics_spark.config import (
        FilterCondition,
        MetricConfig,
        MetricDefinition,
    )
    from beametrics_spark.pipeline import build_metrics_pipeline
    from beametrics_spark.plans import exchanges
    from beametrics_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    cfgs = [
        MetricConfig(
            metric_definition=MetricDefinition(
                name="v_sum",
                type="sum",
                field="value",
                metric_labels={"t": "static"},
                dynamic_labels={"et": "event_type"},
            ),
            filter_conditions=[FilterCondition("value", 10, "greater_than")],
        ),
        MetricConfig(
            metric_definition=MetricDefinition(name="n_err", type="count"),
            filter_conditions=[
                FilterCondition("event_type", "error", "equals")
            ],
        ),
    ]

    def canon(df):
        return sorted(
            (
                r.metric_id,
                r.metric_name,
                tuple(sorted((r.labels or {}).items())),
                round(r.value, 6),
                r.window_start,
            )
            for r in df.collect()
        )

    plain = build_metrics_pipeline(events, cfgs, window_size=300)
    salted = build_metrics_pipeline(
        events, cfgs, window_size=300, salt_buckets=8
    )
    assert canon(salted) == canon(plain)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # phase-1 grouping carries the salt
    assert len(exchanges(salted)) >= 2  # two-phase: partial + merge


def test_salted_aggregate_windows_rejects_non_tumbling(spark, sf_dir):
    import pytest

    from beametrics_spark.config import MetricConfig, MetricDefinition
    from beametrics_spark.pipeline import aggregate_windows, fan_out
    from beametrics_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="n", type="count"),
        filter_conditions=[],
    )
    fanned = fan_out(events, [cfg])
    with pytest.raises(ValueError, match="tumbling"):
        aggregate_windows(
            fanned, [cfg], window_spec=(300, 60, None), salt_buckets=8
        )
