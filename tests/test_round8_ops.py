"""Round-8 wave: streaming CDC merge twin + quantizer-tree supporting
invariants.

Same engine-free strategy as the other rounds' test files: semantics
verified against independent pure-Python recomputation or against the
batch twin, not against the operators' own helpers.
"""

from pyspark.sql import functions as F

from beametrics_spark.sources import load_table


def test_stream_cdc_merge_matches_batch_twin(spark, sf_dir):
    """Applying the change feed in four key-disjoint micro-batches must
    equal the one-shot batch MERGE row for row — including the content
    checksum, which catches a wrong-version row surviving where counts
    alone would not."""
    from beametrics_spark.operators.curation3 import cdc_upsert_merge_audit
    from beametrics_spark.operators.stream_parity import (
        stream_cdc_merge_parity,
    )

    batch = sorted(
        tuple(r) for r in cdc_upsert_merge_audit(spark, sf_dir).collect()
    )
    stream = sorted(
        tuple(r) for r in stream_cdc_merge_parity(spark, sf_dir).collect()
    )
    assert batch == stream and batch


def test_stream_cdc_merge_verbs_all_applied(spark, sf_dir):
    """Every CDC verb must be visible in the drained snapshot audit:
    deletes shrink, inserts grow, updates keep counts but change the
    checksum (text gains a ' v2' suffix)."""
    from beametrics_spark.operators.stream_parity import (
        stream_cdc_merge_parity,
    )

    rows = {r["source"]: r for r in stream_cdc_merge_parity(spark, sf_dir).collect()}
    assert rows
    total_del = sum(r["n_deleted"] for r in rows.values())
    total_upd = sum(r["n_updated"] for r in rows.values())
    total_ins = sum(r["n_inserted"] for r in rows.values())
    assert total_del > 0 and total_upd > 0 and total_ins > 0
    for r in rows.values():
        assert r["n_final"] == r["n_base"] - r["n_deleted"] + r["n_inserted"]


def test_sem_tree_sizes_shape():
    """Upper-level sizes: strictly increasing, start at B, capped at
    ~k/B (leaf fan-out ~B), never more than SEM_UPPER_LEVELS entries,
    and the formula must match the oracle's LEAST(B^l, GREATEST(B,
    ceil(k/B))) with identity levels dropped."""
    import math

    from beametrics_spark.operators.dedup2 import (
        SEM_BRANCH,
        SEM_UPPER_LEVELS,
        _sem_tree_sizes,
    )

    for k in (8, 9, 32, 64, 65, 313, 3125, 31250, 10**6):
        sizes = _sem_tree_sizes(k)
        cap = max(SEM_BRANCH, math.ceil(k / SEM_BRANCH))
        assert sizes[0] == min(SEM_BRANCH, cap)
        assert all(a < b for a, b in zip(sizes, sizes[1:]))
        assert sizes[-1] <= cap
        assert len(sizes) <= SEM_UPPER_LEVELS
        # the dropped-identity reconstruction equals the 5-level formula
        full = [min(SEM_BRANCH**lvl, cap) for lvl in range(1, SEM_UPPER_LEVELS + 1)]
        dedup = []
        for u in full:
            if not dedup or u > dedup[-1]:
                dedup.append(u)
        assert sizes == dedup


def test_sem_tree_assignment_bounded_fanout(spark, sf_dir):
    """Every vector must land on a leaf routed to its upper-tree node,
    and every cluster in the prune output must be a valid leaf id."""
    import math

    from beametrics_spark.operators.dedup2 import (
        SEM_MIN_CLUSTERS,
        SEM_TARGET_CLUSTER,
        semdedup_prune_list,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    k = max(SEM_MIN_CLUSTERS, math.ceil(n / SEM_TARGET_CLUSTER))
    clusters = {
        r["cluster"] for r in semdedup_prune_list(spark, sf_dir).collect()
    }
    assert clusters and all(0 <= c < k for c in clusters)


def test_bm25_cutoff_path_matches_window(spark, sf_dir):
    """The broadcast-cutoff top-k (stop-word skew path) must be
    bit-identical to the default per-query window sort — same rows,
    same ranks, same rounded scores."""
    from beametrics_spark.operators.retrieval import bm25_topk_retrieval

    base = sorted(tuple(r) for r in bm25_topk_retrieval(spark, sf_dir).collect())
    cut = sorted(
        tuple(r)
        for r in bm25_topk_retrieval(
            spark, sf_dir, use_cutoff_rank=True
        ).collect()
    )
    assert base == cut and base


def test_bm25_cutoff_plan_has_no_full_candidate_sort(spark, sf_dir):
    """The cutoff plan must show the width_bucket binning and rank only
    boundary-straddling bins + survivors — no window over the full
    per-query candidate set before the cutoff filter."""
    from beametrics_spark.operators.retrieval import bm25_topk_retrieval

    df = bm25_topk_retrieval(spark, sf_dir, use_cutoff_rank=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "width_bucket" in plan
