"""Property-based parity: the compiled Catalyst predicate must agree with
a pure-Python model of the reference's filter semantics on arbitrary
typed rows and conditions.

The model implements the documented behavior of MessageFilter.matches
(SURVEY.md §2.1 rows 3-3d; reference beametrics/filter.py:13-45):
equals without coercion, contains on strings only, numeric comparisons
rejecting numeric strings, exception→False, unknown-operator→False,
AND composition, empty-list→match-all. Written from the survey's
semantic description — not copied code.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from beametrics_spark.config import FilterCondition
from beametrics_spark.filters import compile_filter, schema_resolver

SCHEMA = T.StructType(
    [
        T.StructField("s1", T.StringType()),
        T.StructField("s2", T.StringType()),
        T.StructField("d1", T.DoubleType()),
        T.StructField("i1", T.LongType()),
    ]
)

FIELDS = ["s1", "s2", "d1", "i1", "missing"]
OPERATORS = ["equals", "contains", "greater_than", "less_than", "bogus_op"]


def model_condition(message: dict, cond: FilterCondition) -> bool:
    """Reference semantics of one condition (filter.py:26-45)."""
    try:
        v = message.get(cond.field)
        if cond.operator == "equals":
            return v == cond.value
        if cond.operator == "contains":
            return cond.value in v  # raises unless both are str-ish
        if cond.operator in ("greater_than", "less_than"):
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                return False
            threshold = float(cond.value)
            return v > threshold if cond.operator == "greater_than" else v < threshold
        return False  # unknown operator
    except Exception:
        return False


def model_matches(message: dict, conditions: list[FilterCondition]) -> bool:
    if not conditions:
        return True
    return all(model_condition(message, c) for c in conditions)


str_values = st.text(
    alphabet="abc015. -", min_size=0, max_size=6
)  # includes numeric-looking strings to probe coercion traps
num_values = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.floats(
        min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
    ),
)

rows = st.fixed_dictionaries(
    {
        "s1": st.one_of(st.none(), str_values),
        "s2": st.one_of(st.none(), str_values),
        "d1": st.one_of(
            st.none(),
            st.floats(
                min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
            ),
        ),
        "i1": st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    }
)

conditions = st.builds(
    FilterCondition,
    field=st.sampled_from(FIELDS),
    value=st.one_of(str_values, num_values, st.none()),
    operator=st.sampled_from(OPERATORS),
)


@pytest.fixture(scope="module")
def parity_spark(spark):
    return spark


@given(
    data=st.lists(rows, min_size=1, max_size=8),
    conds=st.lists(conditions, min_size=0, max_size=3),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_filter_parity_with_reference_model(parity_spark, data, conds):
    df = parity_spark.createDataFrame(
        [tuple(r[f] for f in ("s1", "s2", "d1", "i1")) for r in data], SCHEMA
    )
    pred = compile_filter(conds, schema_resolver(df, json_col=None))
    got = sorted(
        (tuple(r) for r in df.filter(pred).select("s1", "s2", "d1", "i1").collect()),
        key=repr,
    )
    # model sees what the reference saw: a dict WITHOUT the missing keys,
    # integer column as int, float column as float
    expected = sorted(
        (
            tuple(r[f] for f in ("s1", "s2", "d1", "i1"))
            for r in data
            if model_matches({k: v for k, v in r.items() if v is not None}, conds)
        ),
        key=repr,
    )

    def norm(rows_):
        return [
            tuple(
                (round(x, 6) if isinstance(x, float) and not math.isnan(x) else x)
                for x in r
            )
            for r in rows_
        ]

    assert norm(got) == norm(expected)
