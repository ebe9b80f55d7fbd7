"""Curation wave 2 invariants: PII detection, contamination check,
sequence packing, domain rebalancing. Full value parity runs through
scripts/oracle_check.py (every query here has a DuckDB oracle)."""

from pyspark.sql import functions as F

from beametrics_spark.operators.curation2 import (
    SEQ_CAP_TOKENS,
    contamination_ngram_overlap,
    domain_rebalance_sample,
    pii_detection_rates,
    sequence_packing,
)
from beametrics_spark.sources import load_table


def test_pii_rates_match_fixture_arithmetic(spark, sf_dir):
    """doc_id % 7 ∈ {0,1,2} injects exactly one PII item each — per-source
    totals must equal the count of injected docs, and clean docs (% 7 ≥ 3)
    contribute zero (no false positives on the word-salad corpus)."""
    rows = pii_detection_rates(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    injected = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 7 <= 2)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["docs_with_pii"] == injected.get(r["source"], 0)
        assert r["n_emails"] + r["n_phones"] + r["n_ssns"] == r["docs_with_pii"]
        assert 0.0 <= r["pii_doc_rate"] <= 1.0


def test_contamination_benchmark_docs_excluded_and_frac_bounded(spark, sf_dir):
    rows = contamination_ngram_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 10 != 0  # benchmark docs never appear as targets
        assert 0 <= r["n_contaminated"] <= r["n_grams"]
        assert 0.0 <= r["contamination_frac"] <= 1.0


def test_sequence_packing_conserves_tokens_and_seq_ids_consistent(spark, sf_dir):
    """Token mass is conserved across sequences, and each sequence's
    seq_id equals the chunk its first token lands in: the first doc of
    sequence k starts at exactly the sum of all earlier sequences'
    tokens, so floor(start / CAP) must reproduce k."""
    rows = sequence_packing(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    expected = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, seqs in by_source.items():
        seqs.sort(key=lambda r: r["seq_id"])
        assert sum(r["total_tokens"] for r in seqs) == expected[source]
        start = 0
        for r in seqs:
            assert r["seq_id"] == start // SEQ_CAP_TOKENS
            start += r["total_tokens"]


def test_domain_rebalance_targets_uniform_mix(spark, sf_dir):
    """Kept counts must be ≤ originals, rates inversely proportional to
    source size (floor(1000·min/n)), and the keep decision must reproduce
    exactly on a re-run (determinism)."""
    df = domain_rebalance_sample(spark, sf_dir)
    rows = {r["source"]: r for r in df.collect()}
    assert rows
    m = min(r["n_total"] for r in rows.values())
    for r in rows.values():
        assert r["keep_permille"] == (1000 * m) // r["n_total"]
        assert 0 < r["n_kept"] <= r["n_total"]
    again = {r["source"]: r["n_kept"] for r in df.collect()}
    assert again == {s: r["n_kept"] for s, r in rows.items()}
