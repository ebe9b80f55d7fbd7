"""Round-7 wave: lang-id agreement audit, streaming passage-dedup twin,
two-level SemDeDup supporting invariants.

Same engine-free strategy as the other rounds' test files: semantics
verified against independent pure-Python recomputation or against the
batch twin, not against the operators' own helpers.
"""

import pytest
from pyspark.sql import functions as F

from beametrics_spark.operators.text import (
    _LANG_PROFILES,
    lang_id_agreement_audit,
)
from beametrics_spark.sources import load_table


def test_lang_audit_full_agreement(spark, sf_dir):
    """The SQL twin must agree with the Pandas-UDF model on EVERY doc
    (n_agree == n_docs per group) and cover the whole corpus."""
    rows = lang_id_agreement_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_agree"] == r["n_docs"], r
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_lang_audit_matches_pure_python(spark, sf_dir):
    """Third, engine-free implementation of the frozen predictor (plain
    Python, no Counter) must reproduce the audit's predicted counts."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()

    def predict(text):
        if not text:
            return "und"
        chars = [c for c in text.lower() if not c.isspace()]
        stats = {}
        for pos, c in enumerate(chars):
            cnt, fp = stats.get(c, (0, pos))
            stats[c] = (cnt + 1, fp)
        top = sorted(stats, key=lambda c: (-stats[c][0], stats[c][1]))[:12]
        best, best_score = "und", -1
        for lang, prof in _LANG_PROFILES.items():
            score = sum(
                (12 - i) * (12 - prof.index(c))
                for i, c in enumerate(top)
                if c in prof
            )
            if score > best_score:
                best, best_score = lang, score
        return best

    expect = {}
    for r in docs:
        key = (r["lang"], predict(r["text"]))
        expect[key] = expect.get(key, 0) + 1

    got = {
        (r["lang"], r["predicted"]): r["n_docs"]
        for r in lang_id_agreement_audit(spark, sf_dir).collect()
    }
    assert got == expect


def test_stream_passage_dedup_matches_batch_twin(spark, sf_dir):
    """The streaming aggregate + rollup must equal the batch operator
    row for row (epoch boundaries cannot change algebraic counts)."""
    from beametrics_spark.operators.dedup2 import passage_dedup_rate
    from beametrics_spark.operators.stream_parity import (
        stream_passage_dedup_parity,
    )

    batch = sorted(
        tuple(r) for r in passage_dedup_rate(spark, sf_dir).collect()
    )
    stream = sorted(
        tuple(r) for r in stream_passage_dedup_parity(spark, sf_dir).collect()
    )
    assert batch == stream and batch


def test_semdedup_cluster_sizes_bounded(spark, sf_dir):
    """Fixed-target-size clustering: with k = max(8, ceil(n/64)) and a
    trained quantizer, no cluster should degenerate to a quadratic
    blob — cap at 8x the target (the uniform fixture spreads thin)."""
    import math

    from beametrics_spark.operators.dedup2 import (
        SEM_MIN_CLUSTERS,
        SEM_TARGET_CLUSTER,
    )
    from beametrics_spark.operators.dedup2 import semdedup_prune_list  # noqa: F401

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(SEM_MIN_CLUSTERS, math.ceil(n / SEM_TARGET_CLUSTER))
    # reuse the operator's own assignment by grouping its output —
    # every cluster id in the prune list must be < k
    rows = semdedup_prune_list(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r["cluster"] < k for r in rows)
    per = {}
    for r in rows:
        per[r["cluster"]] = per.get(r["cluster"], 0) + 1
    assert max(per.values()) <= 8 * SEM_TARGET_CLUSTER
