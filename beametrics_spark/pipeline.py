"""Plan builder: parsed events → fan-out → tumbling window → count/sum.

This is the Spark-first re-expression of the reference's 6-stage Beam chain
(beametrics/pipeline.py:164-186):

    Decode → FilterAndLabel (FlatMap fan-out) → DynamicFixedWindows
           → CombinePerKey(sum) → Format → Export

Design choices for 100-TB scale (SURVEY.md §4.3):
  - SINGLE-PASS fan-out: the reference's per-message Python loop over N
    configs becomes one `explode` over an array of per-config structs, so
    the source is scanned ONCE regardless of metric count (a union of N
    filtered branches would re-read the stream N times).
  - Catalyst supplies filter pushdown, partial (map-side) aggregation and
    whole-stage codegen for free — the reference hand-rolls filter-before-
    shuffle and relies on Beam combiner lifting (pipeline.py:168-180).
  - Labels are MAP<STRING,STRING>; the grouping key is their canonical
    JSON string (Spark cannot group by MapType) — the exact analog of the
    reference's tuple(sorted(labels.items())) key normalization
    (pipeline.py:172).
  - Aggregation is always sum-of-contributions; COUNT rows contribute 1.0
    (reference pipeline.py:206-207 + CombinePerKey(sum) at :180), so one
    physical aggregate serves both metric types.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beametrics_spark.config import MetricConfig, normalize_window_size
from beametrics_spark.filters import FieldResolver, compile_filter, schema_resolver
from beametrics_spark.metrics import labels_expr, labels_key_expr, value_expr

FANOUT_SCHEMA = "struct<metric_id:int,value:double,labels:map<string,string>>"


def fanout_entries(
    configs: list[MetricConfig], resolve: FieldResolver
) -> Column:
    """Array of per-config contribution structs; non-matching ⇒ filtered out.

    One message → 0..N keyed records (reference FlatMap, pipeline.py:168-178),
    built as a single expression tree evaluated in one scan.
    """
    entries = [
        F.when(
            compile_filter(cfg.filter_conditions, resolve),
            F.struct(
                F.lit(i).cast("int").alias("metric_id"),
                value_expr(cfg.metric_definition, resolve).alias("value"),
                labels_expr(cfg.metric_definition, resolve).alias("labels"),
            ),
        )
        for i, cfg in enumerate(configs)
    ]
    arr = F.array(*entries)
    return F.filter(arr, lambda x: x.isNotNull())


def fan_out(
    df: DataFrame,
    configs: list[MetricConfig],
    *,
    ts_col: str = "ts",
    resolve: FieldResolver | None = None,
) -> DataFrame:
    """events → (ts, metric_id, value, labels, labels_key), single scan."""
    resolve = resolve or schema_resolver(df)
    exploded = df.select(
        F.col(ts_col).alias("ts"),
        F.explode(fanout_entries(configs, resolve)).alias("m"),
    )
    return exploded.select(
        "ts",
        F.col("m.metric_id").alias("metric_id"),
        F.col("m.value").alias("value"),
        F.col("m.labels").alias("labels"),
        labels_key_expr(F.col("m.labels")).alias("labels_key"),
    )


def aggregate_windows(
    fanned: DataFrame,
    configs: list[MetricConfig],
    *,
    window_size: int | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window sum per (metric_id, labels).

    window start = ts - ts % size, identical bucketing math to the
    reference's DynamicFixedWindows.assign (pipeline.py:67-70); invalid
    sizes fall back to 60 s (pipeline.py:50-65).

    ``watermark`` (e.g. "30 seconds") is only applied to streaming frames —
    the reference has NO watermark (SURVEY.md §2.2); bounded state at scale
    requires one, so streaming callers must pass it.
    """
    size = normalize_window_size(
        window_size if window_size is not None else configs[0].window_size
    )
    src = fanned
    if watermark is not None and fanned.isStreaming:
        src = fanned.withWatermark("ts", watermark)
    agg = (
        src.groupBy(
            F.window("ts", f"{size} seconds").alias("window"),
            "metric_id",
            "labels_key",
        )
        .agg(
            F.sum("value").alias("value"),
            F.first("labels").alias("labels"),
        )
    )
    # Attach metric names config-side (tiny, compile-time literal chain —
    # no join needed; reference keeps configs in a Python list the same way,
    # pipeline.py:225-231).
    name_expr = F.lit(None).cast("string")
    for i, cfg in enumerate(configs):
        name_expr = F.when(
            F.col("metric_id") == i, F.lit(cfg.export_metric_name)
        ).otherwise(name_expr)
    return agg.select(
        "metric_id",
        name_expr.alias("metric_name"),
        "labels",
        F.col("value").cast("double").alias("value"),
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    )


def build_metrics_pipeline(
    events: DataFrame,
    configs: list[MetricConfig],
    *,
    ts_col: str = "ts",
    window_size: int | None = None,
    watermark: str | None = None,
    resolve: FieldResolver | None = None,
) -> DataFrame:
    """Full plan: fan-out → window aggregate → formatted metric points.

    Works identically on batch and streaming DataFrames; the DuckDB oracle
    checks the batch plan, streaming deployment adds watermark + sink.
    Configs with distinct window sizes are grouped so each size gets one
    aggregation (the reference supports only a single pipeline-wide window).
    """
    if not configs:
        raise ValueError("at least one MetricConfig required")
    resolve = resolve or schema_resolver(events)
    if window_size is not None:
        sizes = {normalize_window_size(window_size): list(range(len(configs)))}
    else:
        sizes = {}
        for i, cfg in enumerate(configs):
            sizes.setdefault(normalize_window_size(cfg.window_size), []).append(i)
    if len(sizes) == 1:
        fanned = fan_out(events, configs, ts_col=ts_col, resolve=resolve)
        (size,) = sizes
        return aggregate_windows(
            fanned, configs, window_size=size, watermark=watermark
        )
    # Rare: heterogenous window sizes → one branch per size (each branch
    # still fans out all its configs in one scan).
    out: DataFrame | None = None
    for size, idxs in sizes.items():
        subset = [configs[i] for i in idxs]
        fanned = fan_out(events, subset, ts_col=ts_col, resolve=resolve)
        # re-tag metric_id back to global config index
        mapping = F.lit(None).cast("int")
        for local, global_i in enumerate(idxs):
            mapping = F.when(F.col("metric_id") == local, F.lit(global_i)).otherwise(
                mapping
            )
        fanned = fanned.withColumn("metric_id", mapping)
        branch = aggregate_windows(
            fanned,
            configs,
            window_size=size,
            watermark=watermark,
        )
        out = branch if out is None else out.unionByName(branch)
    return out
