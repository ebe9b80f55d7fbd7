"""Metric value + label expression builders.

Reference semantics (SURVEY.md §2.1 rows 4-5):
  - value: COUNT contributes literal 1 per matching row
           (pipeline.py:206-207 — count is implemented as sum-of-ones);
           SUM contributes float(msg.get(field, 0)) — missing field ⇒ 0
           (pipeline.py:208).
  - labels: static labels ∪ dynamic labels where each dynamic label is
           str(msg.get(field_name, "")) — missing field ⇒ "" and the
           dynamic value WINS on key collision (pipeline.py:188-198,
           metrics.py:40-48).

Where the reference's ``float(...)`` would raise on a non-numeric field
(crashing the Beam bundle), we use try_cast → 0.0: a distributed engine
must not abort a 100-TB job on one bad row. Documented deviation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beametrics_spark.config import MetricDefinition, MetricType
from beametrics_spark.filters import FieldResolver, ResolvedField


def value_expr(definition: MetricDefinition, resolve: FieldResolver) -> Column:
    """The per-row contribution to the metric aggregate (always DOUBLE)."""
    if definition.type == MetricType.COUNT:
        return F.lit(1.0)
    rf: ResolvedField = resolve(definition.field)
    col = rf.col if isinstance(rf.dtype, T.NumericType) else rf.col.try_cast("double")
    return F.coalesce(col.cast("double"), F.lit(0.0))


def _label_value(rf: ResolvedField) -> Column:
    """str(msg.get(field, "")) — stringify, missing ⇒ empty string."""
    return F.coalesce(rf.col.cast("string"), F.lit(""))


def labels_expr(definition: MetricDefinition, resolve: FieldResolver) -> Column:
    """MAP<STRING,STRING> of merged static+dynamic labels.

    Keys are emitted in sorted order so ``to_json(labels)`` is a canonical
    grouping key (the reference normalizes with tuple(sorted(labels.items()))
    at pipeline.py:172 for the same reason).
    """
    merged: dict[str, Column] = {
        k: F.lit(str(v)) for k, v in definition.metric_labels.items()
    }
    for label_name, field_name in definition.dynamic_labels.items():
        merged[label_name] = _label_value(resolve(field_name))  # dynamic wins
    if not merged:
        return F.create_map().cast("map<string,string>")
    pairs: list[Column] = []
    for k in sorted(merged):
        pairs.extend([F.lit(k), merged[k]])
    return F.create_map(*pairs)


LABEL_KEY_SEP = "\x01"


def labels_key_expr(labels: Column) -> Column:
    """Canonical string form of a labels map, usable as a grouping key.

    Spark cannot group by MapType directly. Within one metric_id the label
    KEY SET is fixed by config and labels_expr emits keys in sorted order,
    so concatenating the values alone (with an unprintable separator) is a
    canonical key — and far cheaper per row than to_json, which profiled as
    the dominant pre-aggregation cost. The grouping key always includes
    metric_id, so different key sets never collide.
    """
    return F.concat_ws(LABEL_KEY_SEP, F.map_values(labels))
