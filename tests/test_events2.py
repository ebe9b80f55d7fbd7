"""Wave-2 event-sequence analytics: transition matrix, retention
cohorts, interval-overlap sweep. Value parity runs through
scripts/oracle_check.py; here: hand-checked micro-fixtures + invariants."""

import datetime as dt

from pyspark.sql import functions as F

from beametrics_spark.operators.events2 import (
    event_interval_overlap_sweep,
    event_transition_matrix,
    user_retention_cohorts,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_transition_matrix_probabilities_sum_to_one(spark, sf_dir):
    rows = event_transition_matrix(spark, sf_dir).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for from_type, group in by_from.items():
        assert abs(sum(r["p"] for r in group) - 1.0) < 0.01, from_type
        assert all(r["n"] > 0 for r in group)


def test_transition_matrix_hand_checked(spark):
    """u1: a→b→a (pairs ab, ba); u2: a→b (pair ab) → ab:2, ba:1."""
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 1, "a", 0.0, "{}"),
            (2, _ts("2024-01-01T00:01:00"), 1, "b", 0.0, "{}"),
            (3, _ts("2024-01-01T00:02:00"), 1, "a", 0.0, "{}"),
            (4, _ts("2024-01-01T00:00:00"), 2, "a", 0.0, "{}"),
            (5, _ts("2024-01-01T00:03:00"), 2, "b", 0.0, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    import beametrics_spark.operators.events2 as e2
    from beametrics_spark import sources

    orig = sources.load_table
    try:
        sources_load = lambda spark, sf_dir, name: events  # noqa: E731
        e2.load_table = sources_load
        got = {
            (r["from_type"], r["to_type"]): (r["n"], r["p"])
            for r in event_transition_matrix(spark, "ignored").collect()
        }
    finally:
        e2.load_table = orig
    assert got[("a", "b")] == (2, round(2 / 2, 4))
    assert got[("b", "a")] == (1, 1.0)
    assert ("b", "b") not in got


def test_retention_day_zero_counts_whole_cohort(spark, sf_dir):
    rows = user_retention_cohorts(spark, sf_dir).collect()
    # day 0 exists for every cohort (the first-activity day itself) and
    # no later offset can exceed it
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = r["n_users"]
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets, cohort
        assert all(n <= offsets[0] for n in offsets.values())
        assert all(off >= 0 for off in offsets)


def test_sweep_hand_checked_peak(spark):
    """Three intervals of type a: [0,10], [5,15], [20,25] → peak 2;
    touching pair [0,10],[10,20] of type b → peak 1 (ends before starts)."""
    base = _ts("2024-01-01T00:00:00")

    def mk(i, typ, start_s, dur):
        return (
            i,
            base + dt.timedelta(seconds=start_s),
            1,
            typ,
            float(dur),
            "{}",
        )

    events = spark.createDataFrame(
        [
            mk(1, "a", 0, 10),
            mk(2, "a", 5, 10),
            mk(3, "a", 20, 5),
            mk(4, "b", 0, 10),
            mk(5, "b", 10, 10),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    import beametrics_spark.operators.events2 as e2

    orig = e2.load_table
    try:
        e2.load_table = lambda spark, sf_dir, name: events
        got = {
            r["event_type"]: (r["max_concurrent"], r["n_intervals"])
            for r in event_interval_overlap_sweep(spark, "ignored").collect()
        }
    finally:
        e2.load_table = orig
    assert got["a"] == (2, 3)
    assert got["b"] == (1, 2)


def test_sweep_peak_positive_everywhere(spark, sf_dir):
    rows = event_interval_overlap_sweep(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["max_concurrent"] >= 1
        assert r["n_intervals"] > 0


# --- property test: sweep line vs brute force ---------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # start offset s
            st.integers(min_value=0, max_value=20),  # duration
        ),
        min_size=1,
        max_size=12,
    )
)
def test_sweep_matches_brute_force(spark, intervals):
    """The windowed-cumsum peak equals the brute-force 'max open at any
    start point' count for arbitrary half-open intervals [s, s+d)."""
    base = _ts("2024-01-01T00:00:00")
    rows = [
        (i, base + dt.timedelta(seconds=s), 1, "t", float(d), "{}")
        for i, (s, d) in enumerate(intervals)
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import beametrics_spark.operators.events2 as e2

    orig = e2.load_table
    try:
        e2.load_table = lambda spark, sf_dir, name: events
        got = event_interval_overlap_sweep(spark, "x").collect()[0]["max_concurrent"]
    finally:
        e2.load_table = orig
    # brute force: concurrency only changes at starts; interval is
    # half-open (end-before-start tie rule), so count s <= p < s+d
    brute = max(
        sum(1 for s, d in intervals if s <= p < s + d)
        for p, _ in intervals
    )
    assert got == brute


def test_trend_hand_checked(spark):
    """Perfect line value = 2*day + 1 → slope 2/day, r2 = 1."""
    import beametrics_spark.operators.events2 as e2

    base = _ts("2024-01-01T00:00:00")
    rows = [
        (i, base + dt.timedelta(days=i), 1, "a", float(2 * i + 1), "{}")
        for i in range(10)
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = e2.load_table
    try:
        e2.load_table = lambda spark, sf_dir, name: events
        r = e2.value_trend_per_type(spark, "x").collect()[0]
    finally:
        e2.load_table = orig
    assert r["slope_per_day"] == 2.0
    assert r["intercept"] == 1.0
    assert r["r2"] == 1.0


def test_psi_terms_sum_properties(spark, sf_dir):
    import beametrics_spark.operators.events2 as e2

    rows = e2.event_type_drift_psi(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # each PSI term is non-negative by construction
        assert r["psi_term"] >= 0
        assert 0 < r["p_early"] < 1 and 0 < r["p_late"] < 1
    # near-uniform synthetic traffic: total drift should be tiny
    assert sum(r["psi_term"] for r in rows) < 0.05


def test_path_trigrams_consistent_with_transitions(spark, sf_dir):
    import beametrics_spark.operators.events2 as e2

    rows = e2.event_path_trigrams(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        parts = r["path"].split(" > ")
        assert len(parts) == 3
