"""Source registry: batch + streaming readers.

The reference has exactly ONE source — Pub/Sub bytes (main.py:313). Our
engine generalizes to a registry keyed by format string, covering the
batch tables the oracle checks (parquet) plus the streaming analogs
(file/rate/kafka/socket) of the reference's deployment.

Nanosecond-timestamp note: the driver's parquet testdata stores
TIMESTAMP(NANOS), which Spark rejects by default. We read them with
``spark.sql.legacy.parquet.nanosAsLong=true`` and convert nanos→TIMESTAMP
(microsecond) at load, detecting affected columns from the pyarrow footer
so the fix is generic, not per-table.
"""

from __future__ import annotations

import glob
import os
from typing import Iterable

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as timestamp[ns] in the parquet footer."""
    sample = path
    if os.path.isdir(path):
        inner = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not inner:
            return []
        sample = inner[0]
    try:
        schema = pq.read_schema(sample)
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with nanos-timestamp normalization.

    Column pruning + predicate pushdown still apply: the nanos→micros
    conversion is a projection on top of the scan, and filters on other
    columns push through it.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Parquet timestamps with isAdjustedToUTC=false would infer as
    # TIMESTAMP_NTZ under Spark 4's default; read them as LTZ instead so
    # (with the UTC session timezone) wall-clock values match DuckDB's naive
    # timestamps and remain castable to numeric epoch seconds.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for name in _nanos_timestamp_columns(path):
        # Guard on the LOADED dtype: pyarrow reports Spark-written INT96
        # timestamps as timestamp[ns] too, but Spark reads those as real
        # TIMESTAMP — only a bigint column is actually raw epoch-nanos
        # needing conversion. Integer `div`, NOT float division:
        # epoch-nanos (~1.7e18) exceeds double's 2^53 exact-integer range
        # and would round the microsecond.
        if dtypes.get(name) == "bigint":
            df = df.withColumn(
                name, F.timestamp_micros(F.expr(f"`{name}` div 1000"))
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> None:
    """TempView per table so SQL-API queries work (`spark.sql`)."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def read_batch(
    spark: SparkSession,
    fmt: str,
    path: str | None = None,
    *,
    schema=None,
    options: dict | None = None,
) -> DataFrame:
    """Generic batch reader: parquet/csv/json/orc/text (+ jdbc, which needs
    a driver jar on the classpath — option plumbing real, environment-gated).

    Always pass an explicit schema for csv/json in production — inference
    is a full extra pass over the data.
    """
    if fmt == "parquet":
        return read_parquet(spark, path)
    reader = spark.read.format(fmt)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path) if path is not None else reader.load()


# ---------------------------------------------------------------------------
# Streaming sources — analogs of the reference's Pub/Sub read (main.py:313).
# Each returns a streaming DataFrame with a BINARY/STRING `value` column and
# (where the source provides one) an event timestamp.
# ---------------------------------------------------------------------------


def stream_source(
    spark: SparkSession,
    fmt: str,
    *,
    path: str | None = None,
    schema=None,
    options: dict | None = None,
) -> DataFrame:
    """readStream factory.

    fmt ∈ {"json", "parquet", "rate", "kafka", "socket"}. Kafka needs the
    spark-sql-kafka jar on the classpath (not in this image) — the option
    plumbing is real, the connector is environment-gated.
    """
    options = options or {}
    reader = spark.readStream.format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in ("json", "parquet", "csv", "text"):
        if path is None:
            raise ValueError(f"{fmt} stream needs a path")
        return reader.load(path)
    return reader.load()
