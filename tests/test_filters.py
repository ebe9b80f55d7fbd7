"""Filter-semantics truth tables, ported from the reference's
tests/test_filter.py (equals/contains/greater_than/less_than, AND
composition, None/missing/uncoercible edge cases — SURVEY.md §5)."""

import pytest
from pyspark.sql import types as T

from beametrics_spark.config import FilterCondition
from beametrics_spark.filters import compile_filter, schema_resolver

SCHEMA = T.StructType(
    [
        T.StructField("severity", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("code", T.StringType()),  # string "500", not int
        T.StructField("response_time", T.DoubleType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("props", T.StringType()),
    ]
)

ROWS = [
    ("ERROR", "test1", "500", 1.5, 100, '{"region": "us", "rt": 3.5}'),
    ("INFO", "Process completed", "200", 0.2, 200, '{"region": "eu"}'),
    ("ERROR", "database connection failed", "500", None, None, "not json"),
]


@pytest.fixture(scope="module")
def logs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def matched(df, conditions):
    pred = compile_filter(conditions, schema_resolver(df))
    return df.filter(pred).count()


def test_equals_string(logs):
    assert matched(logs, [FilterCondition("severity", "ERROR", "equals")]) == 2


def test_equals_no_numeric_coercion(logs):
    # reference filter.py:27-28 — "500" (column) vs 500 (int config) never match
    assert matched(logs, [FilterCondition("code", 500, "equals")]) == 0
    assert matched(logs, [FilterCondition("code", "500", "equals")]) == 2
    # numeric column vs string config value never match either
    assert matched(logs, [FilterCondition("bytes", "100", "equals")]) == 0
    assert matched(logs, [FilterCondition("bytes", 100, "equals")]) == 1


def test_contains(logs):
    assert matched(logs, [FilterCondition("message", "failed", "contains")]) == 1
    assert matched(logs, [FilterCondition("message", "zzz", "contains")]) == 0
    # non-string condition value ⇒ False (reference exception→False path)
    assert matched(logs, [FilterCondition("message", 123, "contains")]) == 0
    # contains over a non-string column ⇒ False (filter.py:29-31)
    assert matched(logs, [FilterCondition("bytes", "10", "contains")]) == 0


def test_greater_less_than(logs):
    assert matched(logs, [FilterCondition("response_time", 1.0, "greater_than")]) == 1
    assert matched(logs, [FilterCondition("response_time", "1.0", "greater_than")]) == 1
    assert matched(logs, [FilterCondition("response_time", 1.0, "less_than")]) == 1
    # numeric strings in a typed string column do NOT match (filter.py:33)
    assert matched(logs, [FilterCondition("code", 300, "greater_than")]) == 0
    # uncoercible condition value ⇒ False (filter.py:43-45)
    assert matched(logs, [FilterCondition("response_time", "abc", "greater_than")]) == 0
    # None / missing column value ⇒ no match
    assert matched(logs, [FilterCondition("response_time", 0.0, "greater_than")]) == 2


def test_and_composition(logs):
    conds = [
        FilterCondition("severity", "ERROR", "equals"),
        FilterCondition("message", "database", "contains"),
    ]
    assert matched(logs, conds) == 1


def test_match_all_empty_conditions(logs):
    assert matched(logs, []) == 3
    assert matched(logs, None) == 3


def test_unknown_operator(logs):
    assert matched(logs, [FilterCondition("severity", "ERROR", "regex")]) == 0


def test_missing_field_never_matches(logs):
    # field absent from schema AND from props JSON → None → False
    assert matched(logs, [FilterCondition("nonexistent", "x", "equals")]) == 0
    assert matched(logs, [FilterCondition("nonexistent", 1, "greater_than")]) == 0


def test_json_dynamic_field(logs):
    # fields not in the schema resolve through the props JSON column
    assert matched(logs, [FilterCondition("region", "us", "equals")]) == 1
    assert matched(logs, [FilterCondition("rt", 2.0, "greater_than")]) == 1


def test_equals_none_matches_missing(logs):
    # dict.get(missing) is None; None == None ⇒ True in the reference
    assert matched(logs, [FilterCondition("response_time", None, "equals")]) == 1
