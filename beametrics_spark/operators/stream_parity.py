"""Batch ≡ streaming parity, surfaced in the correctness gate.

The same logical plan (`build_metrics_pipeline`) runs here as a
Structured Streaming query over a file source, drained synchronously
with processAllAvailable into a memory sink — and is checked against the
SAME DuckDB oracle as the batch `ref_equals_count`. This is the claim
the reference can't test (Beam TestPipeline only) made into a gate:
stream mode computes byte-identical aggregates to batch mode.

complete output mode: every window is final after the single batch, so
no watermark-advancement second trigger is needed to flush results.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.config import FilterCondition, MetricConfig, MetricDefinition
from beametrics_spark.pipeline import build_metrics_pipeline
from beametrics_spark.registry import register


@register(
    "stream_equals_count_parity",
    """
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           CAST(count(*) AS DOUBLE) AS value
    FROM events WHERE event_type = 'error'
    GROUP BY 1
    """,
)
def stream_equals_count_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ref_equals_count, but executed via readStream → memory sink."""
    # file streaming source needs an explicit schema — use the RAW footer
    # schema (ts arrives as nanos-long under nanosAsLong), then normalize
    # to TIMESTAMP exactly like the batch loader does
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    # FileStreamSource requires a directory — expose the file through one
    stream_dir = tempfile.mkdtemp(prefix="beametrics_stream_src_")
    os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.schema(raw_schema).format("parquet").load(stream_dir)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="error_count", type="count"),
        filter_conditions=[FilterCondition("event_type", "error", "equals")],
    )
    plan = build_metrics_pipeline(stream, [cfg], window_size=60)
    name = f"parity_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="beametrics_ckpt_")
    from beametrics_spark.streaming import scoped_state_partitions

    with scoped_state_partitions(spark):
        q = (
            plan.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        "window_start", F.col("value").cast("double").alias("value")
    )
