"""FilterCondition list → Catalyst Column compiler.

Replicates the reference's predicate semantics (beametrics/filter.py:13-45)
as compile-time expression construction, so the resulting predicate runs
JVM-side inside whole-stage codegen and is pushed down into the source
scan by Catalyst — the reference evaluates the same logic per-row in
Python inside a FlatMap (pipeline.py:176).

Reference semantics replicated deliberately (SURVEY.md §7.3):
  - ``equals``      — raw equality, NO numeric/string coercion
                      (filter.py:27-28; "500" != 500). Spark's `==` coerces,
                      so we type-check the column against the condition
                      value's Python type at compile time and emit
                      ``lit(False)`` on type mismatch.
  - ``contains``    — substring test; non-string message value ⇒ False
                      (filter.py:29-31).
  - ``greater_than``/``less_than`` — message value must already be numeric
                      (numeric STRINGS do not match, filter.py:32-41);
                      condition value coerced with float(); an uncoercible
                      condition value ⇒ False (exception→False,
                      filter.py:43-45).
  - unknown operator ⇒ False (filter.py:42).
  - empty condition list ⇒ match-all (filter.py:18-19).
  - conditions AND-composed (filter.py:21-23).

Fields resolved from a JSON side-channel (``props`` string column) have no
static type (get_json_object returns the scalar as a string), so for those
we use try_cast-based permissive comparison — the closest analog of the
reference's dict access where JSON numbers arrive as Python floats.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beametrics_spark.config import FilterCondition

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


@dataclass(frozen=True)
class ResolvedField:
    """A message field resolved to a Column plus its static type.

    ``dtype`` is None when the field came from schema-less JSON extraction
    (dynamic type — compare permissively, like the reference's dict access).
    """

    col: Column
    dtype: T.DataType | None


FieldResolver = Callable[[str], ResolvedField]


def schema_resolver(df: DataFrame, json_col: str | None = "props") -> FieldResolver:
    """Resolve field names against a DataFrame schema.

    Top-level typed columns resolve with their static type; unknown fields
    fall through to ``get_json_object(json_col, '$.field')`` (dynamic) —
    mirroring how the reference reads any key of the parsed JSON dict
    (pipeline.py:195,208).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}

    def resolve(name: str) -> ResolvedField:
        if name in fields:
            return ResolvedField(F.col(name), fields[name])
        if json_col is not None and json_col in fields:
            return ResolvedField(
                F.get_json_object(F.col(json_col), f"$.{name}"), None
            )
        # Missing field: reference dict.get ⇒ None ⇒ every operator False
        return ResolvedField(F.lit(None).cast("string"), None)

    return resolve


def _is_numeric(dtype: T.DataType | None) -> bool:
    return isinstance(dtype, _NUMERIC_TYPES)


def _compile_equals(rf: ResolvedField, value) -> Column:
    # None condition value: dict.get(missing) is None and None == None ⇒ True
    if value is None:
        return rf.col.isNull()
    if isinstance(value, bool):
        if isinstance(rf.dtype, T.BooleanType):
            return rf.col == F.lit(value)
        if rf.dtype is None:
            return rf.col.cast("string") == F.lit(str(value).lower())
        return F.lit(False)
    if isinstance(value, str):
        if isinstance(rf.dtype, T.StringType):
            return rf.col == F.lit(value)
        if rf.dtype is None:
            return rf.col == F.lit(value)  # JSON scalar extracted as string
        return F.lit(False)  # "500" never equals numeric 500 (filter.py:27-28)
    if isinstance(value, (int, float)):
        if _is_numeric(rf.dtype):
            return rf.col == F.lit(float(value))
        if rf.dtype is None:
            return rf.col.try_cast("double") == F.lit(float(value))
        return F.lit(False)  # numeric 500 never equals string "500"
    return F.lit(False)


def _compile_contains(rf: ResolvedField, value) -> Column:
    # Non-string condition or non-string message value ⇒ False
    # (filter.py:29-31; `500 in "x"` raises ⇒ exception→False path).
    if not isinstance(value, str):
        return F.lit(False)
    if isinstance(rf.dtype, T.StringType) or rf.dtype is None:
        return rf.col.contains(value)
    return F.lit(False)


def _compile_numeric_cmp(rf: ResolvedField, value, op: str) -> Column:
    try:
        threshold = float(value)
    except (TypeError, ValueError):
        return F.lit(False)  # uncoercible condition ⇒ exception ⇒ False
    if _is_numeric(rf.dtype):
        col = rf.col
    elif rf.dtype is None:
        # Dynamic JSON field: a JSON number arrives as Python float in the
        # reference, so permissive numeric cast is the faithful analog.
        col = rf.col.try_cast("double")
    else:
        return F.lit(False)  # typed strings are "not numeric" (filter.py:33)
    return col > F.lit(threshold) if op == "greater_than" else col < F.lit(threshold)


def compile_condition(cond: FilterCondition, resolve: FieldResolver) -> Column:
    rf = resolve(cond.field)
    if cond.operator == "equals":
        return _compile_equals(rf, cond.value)
    if cond.operator == "contains":
        return _compile_contains(rf, cond.value)
    if cond.operator in ("greater_than", "less_than"):
        return _compile_numeric_cmp(rf, cond.value, cond.operator)
    return F.lit(False)  # unknown operator (filter.py:42)


def compile_filter(
    conditions: list[FilterCondition] | None, resolve: FieldResolver
) -> Column:
    """AND-composition; empty/None ⇒ match-all (filter.py:18-23)."""
    if not conditions:
        return F.lit(True)
    cols = [compile_condition(c, resolve) for c in conditions]
    # NULL (missing field) already behaves as a non-match in every context
    # this predicate is used — filter() drops NULL, when() falls through —
    # matching the reference's None-handling (every operator returns False
    # on None). Do NOT wrap in coalesce(pred, false): that blocks Catalyst
    # from pushing the simple comparisons into the parquet scan.
    return reduce(lambda a, b: a & b, cols)
