"""Property tests for the scale-pattern kernels, engine-free: the
pigeonhole candidate guarantee of the heavy-hitter pass-1 generator
(pure pandas) and the generated Morton SQL vs an independent Python
interleave (evaluated in DuckDB). These pin the math the Spark plans
rely on without paying a Spark job per hypothesis example."""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from beametrics_spark.operators.scale_patterns import (
    _HH_DEN,
    _HH_NUM,
    _Z_SQL,
    _hh_partials,
)


# --- heavy hitters: pass-1 candidate superset --------------------------------


@st.composite
def partitioned_multiset(draw):
    """A random key multiset split into 1-6 partitions of random sizes."""
    keys = draw(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400)
    )
    n_parts = draw(st.integers(min_value=1, max_value=6))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(keys)),
                min_size=n_parts - 1,
                max_size=n_parts - 1,
            )
        )
    )
    bounds = [0, *cuts, len(keys)]
    parts = [keys[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]
    return keys, parts


def run_pass1(partition: list[int]) -> pd.DataFrame:
    batches = [pd.DataFrame({"l_partkey": pd.Series(partition, dtype="int64")})]
    out = list(_hh_partials(iter(batches)))
    return out[0] if out else pd.DataFrame({"l_partkey": [], "c": []})


@settings(max_examples=200, deadline=None)
@given(partitioned_multiset())
def test_pass1_candidates_cover_all_global_heavy_keys(case):
    keys, parts = case
    n = len(keys)
    global_counts = pd.Series(keys).value_counts()
    heavy = {int(k) for k, c in global_counts.items() if c * _HH_DEN >= _HH_NUM * n}

    candidates = set()
    sentinel_total = 0
    for part in parts:
        out = run_pass1(part)
        sentinel_total += int(out.loc[out["l_partkey"] == -1, "c"].sum())
        candidates |= set(out.loc[out["l_partkey"] >= 0, "l_partkey"].astype(int))

    # pigeonhole: every globally-heavy key must be locally heavy somewhere
    assert heavy <= candidates
    # the sentinel rows reconstruct N exactly (empty partitions emit nothing)
    assert sentinel_total == n


@settings(max_examples=100, deadline=None)
@given(partitioned_multiset())
def test_pass1_plus_exact_recheck_is_exact(case):
    keys, parts = case
    n = len(keys)
    global_counts = pd.Series(keys).value_counts()
    want = {
        int(k): int(c)
        for k, c in global_counts.items()
        if c * _HH_DEN >= _HH_NUM * n
    }

    candidates = set()
    for part in parts:
        out = run_pass1(part)
        candidates |= set(out.loc[out["l_partkey"] >= 0, "l_partkey"].astype(int))
    # recheck pass: exact counts of candidates only, global threshold
    got = {
        int(k): int(c)
        for k, c in global_counts.items()
        if int(k) in candidates and c * _HH_DEN >= _HH_NUM * n
    }
    assert got == want


# --- Morton interleave: generated SQL vs independent Python ------------------


def py_interleave(xb: int, yb: int) -> int:
    z = 0
    for i in range(8):
        z |= ((xb >> i) & 1) << (2 * i)
        z |= ((yb >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_generated_morton_sql_matches_python(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (xb INTEGER, yb INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    got = con.execute(f"SELECT xb, yb, ({_Z_SQL}) FROM t").fetchall()
    for xb, yb, z in got:
        assert z == py_interleave(xb, yb)
