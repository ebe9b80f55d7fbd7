"""Arbitrary stateful streaming via ``transformWithStateInPandas`` —
Spark 4.x's typed-state processor API (the successor to
``applyInPandasWithState``, see stateful.py for the sessionizer built on
the older API).

The reference exposes no stateful surface at all (SURVEY.md §2.2); its
windowed count/sum resets every window. This operator is the
cross-window generalization: exact per-key running totals carried across
micro-batches in a ValueState cell, emitted as an update row whenever a
key sees new data.

Scale stance: state is one fixed-width row per key (two numerics), hash
partitioned by key across executors, backed by the RocksDB state store
(spillable, incremental checkpoints) — a 1e9-key corpus holds ~tens of
GB of state cluster-wide, and keys idle forever cost nothing per batch.

Environment note: the TWS Python runner imports google.protobuf, which
this container lacks (no pip install allowed), so the in-container test
is skip-gated; the operator itself is plain public PySpark 4.x API and
runs unmodified on any protobuf-equipped cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

TOTALS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key lifetime (n_events, total_value), exact across batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """events stream → one update row per (key, micro-batch) with the
    key's exact lifetime totals. Update output mode: downstream sinks see
    the latest value per key (the metric-point shape of the reference's
    sink, but cumulative instead of per-window)."""
    prepped = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepped.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
