"""Wave-2 text quality signals: repetition metrics, corpus-duplicated
n-gram fraction, composite pass-rate rollup.

Shape + invariant checks here; value parity runs through
scripts/oracle_check.py (all three have DuckDB oracles).
"""

from pyspark.sql import functions as F

from beametrics_spark.operators.text2 import (
    corpus_duplicate_ngram_fraction,
    quality_filter_pass_rates,
    quality_repetition_signals,
)


def test_repetition_signals_bounds(spark, sf_dir):
    rows = quality_repetition_signals(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["n_tokens"] > 0
        assert 0 < r["ttr"] <= 1.0
        # top-unigram mass is at least 1/n and at most 1
        assert 0 < r["top_unigram_mass"] <= 1.0
        assert r["mean_word_len"] > 0
        assert 0 <= r["top_bigram_mass"] <= 1.0


def test_repetition_signals_known_doc(spark):
    """Hand-checked doc: 6 tokens, 'a' three times → mass 0.5, ttr 4/6."""
    docs = spark.createDataFrame(
        [(1, "a a b a c d"), (2, "x y")], ["doc_id", "text"]
    )
    from beametrics_spark.operators.text2 import _per_doc_signals

    rows = {r["doc_id"]: r for r in _per_doc_signals(docs).collect()}
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["top_unigram_mass"] == 0.5
    assert rows[1]["ttr"] == round(4 / 6, 3)
    assert rows[1]["mean_word_len"] == 1.0
    assert rows[2]["ttr"] == 1.0


def test_dup_fraction_bounds_and_dups_exist(spark, sf_dir):
    rows = corpus_duplicate_ngram_fraction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_shingles"] > 0
        assert 0 <= r["dup_shingle_frac"] <= 1.0
    # the synthetic corpus contains exact duplicates → some doc must have
    # every shingle duplicated
    assert any(r["dup_shingle_frac"] == 1.0 for r in rows)


def test_pass_rates_mass_conservation(spark, sf_dir):
    rows = quality_filter_pass_rates(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert 0.0 <= r["pass_rate"] <= 1.0
    # thresholds must actually split the corpus, not pass/fail everything
    total_pass = sum(r["n_pass"] for r in rows)
    assert 0 < total_pass < n_docs


def test_no_python_udfs_in_plans(spark, sf_dir):
    """All three queries stay JVM-side (no BatchEvalPython / ArrowEval)."""
    for fn in (
        quality_repetition_signals,
        corpus_duplicate_ngram_fraction,
        quality_filter_pass_rates,
    ):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_tfidf_top3_per_doc(spark, sf_dir):
    from beametrics_spark.operators.text2 import tfidf_top_terms

    rows = tfidf_top_terms(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == n_docs
    for doc_rows in by_doc.values():
        assert [r["rk"] for r in sorted(doc_rows, key=lambda r: r["rk"])] == list(
            range(1, len(doc_rows) + 1)
        )
        scores = [r["tfidf"] for r in sorted(doc_rows, key=lambda r: r["rk"])]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
