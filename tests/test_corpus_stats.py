"""Corpus statistics (template prefixes, cross-source dup accounting,
vocabulary growth) + events2 additions (OHLC, MAD anomaly days).
Value parity runs through scripts/oracle_check.py; here: invariants and
hand-checked micro-fixtures."""

import datetime as dt

from beametrics_spark.operators.corpus_stats import (
    source_crossover_dup_rate,
    template_prefix_clusters,
    vocab_growth_curve,
)
from beametrics_spark.operators.events2 import (
    daily_anomaly_mad,
    ohlc_downsample,
)


def test_prefix_clusters_supersede_exact_dups(spark, sf_dir):
    rows = template_prefix_clusters(spark, sf_dir).collect()
    assert rows, "synthetic corpus plants exact dups, which share prefixes"
    for r in rows:
        assert r["n_docs"] > 1
        assert 1 <= r["n_distinct_texts"] <= r["n_docs"]
        assert 1 <= r["n_sources"] <= r["n_docs"]
        assert len(r["prefix"].split(" ")) <= 8


def test_crossover_rates_are_consistent(spark, sf_dir):
    rows = source_crossover_dup_rate(spark, sf_dir).collect()
    n_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        # a cross-source dup is in particular a dup
        assert r["n_cross_dup"] <= r["n_dup"] <= r["n_docs"]
        assert 0 <= r["cross_dup_rate"] <= r["dup_rate"] <= 1


def test_vocab_growth_monotone_and_exact_at_the_end(spark, sf_dir):
    rows = sorted(
        vocab_growth_curve(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] <= b["n_docs"]
        assert a["n_tokens"] <= b["n_tokens"]
        assert a["vocab_size"] <= b["vocab_size"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert rows[-1]["n_docs"] == docs.count()
    # final vocab == corpus-wide distinct whitespace tokens
    from pyspark.sql import functions as F

    n_types = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    assert rows[-1]["vocab_size"] == n_types


def test_ohlc_invariants(spark, sf_dir):
    rows = ohlc_downsample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n"] > 0
        # 6-hour alignment
        assert r["bucket"].hour % 6 == 0
        assert r["bucket"].minute == 0


def test_ohlc_hand_checked(spark):
    import beametrics_spark.operators.events2 as e2

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    events = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=1), 1, "a", 5.0, "{}"),
            (2, base + dt.timedelta(minutes=2), 1, "a", 9.0, "{}"),
            (3, base + dt.timedelta(minutes=3), 1, "a", 1.0, "{}"),
            (4, base + dt.timedelta(minutes=4), 1, "a", 7.0, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    orig = e2.load_table
    try:
        e2.load_table = lambda spark, sf_dir, name: events
        r = ohlc_downsample(spark, "ignored").collect()[0]
    finally:
        e2.load_table = orig
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == (
        5.0,
        9.0,
        1.0,
        7.0,
        4,
    )


def test_anomaly_days_fire_and_are_extreme(spark, sf_dir):
    rows = daily_anomaly_mad(spark, sf_dir).collect()
    assert rows, "MAD_K chosen so the gate actually fires on the corpus"
    for r in rows:
        assert abs(r["robust_z"]) > 2.0


# --- property test: vocab growth vs brute force -------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6),
        min_size=1,
        max_size=20,
    )
)
def test_vocab_growth_matches_brute_force(spark, docs):
    import beametrics_spark.operators.corpus_stats as cs

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    orig = cs.load_table
    try:
        cs.load_table = lambda spark, sf_dir, name: df
        got = {
            r["decile"]: (r["n_docs"], r["n_tokens"], r["vocab_size"])
            for r in vocab_growth_curve(spark, "x").collect()
        }
    finally:
        cs.load_table = orig
    n = len(docs)
    for d in range(1, 11):
        # decile d covers docs with (doc_id+1)*10 <= d*n … integer rule:
        # doc p (1-based) belongs to decile ceil(p*10/n)
        upto = [i for i in range(n) if -(-(i + 1) * 10 // n) <= d]
        toks = [w for i in upto for w in docs[i]]
        types = set(toks)
        assert got[d] == (len(upto), len(toks), len(types)), d
