"""Property tests for the scale-pattern kernels, engine-free: the
bucket-sketch candidate guarantee of the heavy-hitter pass 1 (for ANY
bucket assignment, heavy keys' buckets clear the threshold and the
exact recheck removes collision false-positives) and the generated
Morton SQL vs an independent Python interleave (evaluated in DuckDB).
These pin the math the Spark plans rely on without paying a Spark job
per hypothesis example."""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from beametrics_spark.operators.scale_patterns import (
    _HH_DEN,
    _HH_NUM,
    _Z_SQL,
)


# --- heavy hitters: bucket-sketch candidate superset --------------------------


@st.composite
def bucketed_multiset(draw):
    """A random key multiset plus an ARBITRARY key->bucket assignment —
    the guarantee must hold for any hash, including adversarial ones
    that collide every key."""
    keys = draw(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400)
    )
    n_buckets = draw(st.integers(min_value=1, max_value=8))
    assign = {
        k: draw(st.integers(min_value=0, max_value=n_buckets - 1))
        for k in set(keys)
    }
    return keys, assign


@settings(max_examples=200, deadline=None)
@given(bucketed_multiset())
def test_bucket_pass_candidates_cover_all_global_heavy_keys(case):
    keys, assign = case
    n = len(keys)
    counts = pd.Series(keys).value_counts()
    heavy = {int(k) for k, c in counts.items() if c * _HH_DEN >= _HH_NUM * n}

    bucket_counts: dict[int, int] = {}
    for k, c in counts.items():
        bucket_counts[assign[int(k)]] = bucket_counts.get(assign[int(k)], 0) + int(c)
    cand_buckets = {
        b for b, c in bucket_counts.items() if c * _HH_DEN >= _HH_NUM * n
    }
    # a bucket's count upper-bounds each key inside it, so every heavy
    # key's bucket clears the threshold
    assert all(assign[k] in cand_buckets for k in heavy)
    # and the bucket counts reconstruct N exactly
    assert sum(bucket_counts.values()) == n


@settings(max_examples=100, deadline=None)
@given(bucketed_multiset())
def test_bucket_pass_plus_exact_recheck_is_exact(case):
    keys, assign = case
    n = len(keys)
    counts = pd.Series(keys).value_counts()
    want = {
        int(k): int(c) for k, c in counts.items() if c * _HH_DEN >= _HH_NUM * n
    }

    bucket_counts: dict[int, int] = {}
    for k, c in counts.items():
        bucket_counts[assign[int(k)]] = bucket_counts.get(assign[int(k)], 0) + int(c)
    cand_buckets = {
        b for b, c in bucket_counts.items() if c * _HH_DEN >= _HH_NUM * n
    }
    # recheck pass: exact counts of candidate-bucket keys only, global
    # threshold removes collision false-positives
    got = {
        int(k): int(c)
        for k, c in counts.items()
        if assign[int(k)] in cand_buckets and c * _HH_DEN >= _HH_NUM * n
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
