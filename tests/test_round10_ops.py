"""Round-10 pins: fan-out fast path, pushed-down Q2, MOR streaming twin,
cache hygiene.

- fan_out (pipeline.py): ONE config ⇒ no Generate and no interpreted
  ArrayFilter anywhere in the plan — the whole pre-aggregation stage is
  a flat codegen projection; N configs ⇒ the null entries are dropped
  by a plain post-explode Filter, never by an array HOF (HOFs are
  CodegenFallback — the r9 shape evaluated an interpreted lambda per
  input row on the hot path).
- tpch_q2 (relational6.py): part + EUROPE predicates commute with the
  (l_partkey, l_suppkey) min and must sit BELOW the lineitem aggregate
  as broadcast semi joins.
- stream_cdc_mor_parity (stream_parity.py): chunked append-only log
  ingestion + one read-side reconcile equals the one-shot batch
  cdc_merge_on_read_audit bit-for-bit (same mor_reconcile_audit plan).
- train_ivf_centroids (ivf.py): releases every per-round cache after
  the final collect (ADVICE r9 — repeated training calls were leaking
  `iters` cached tables each into the CacheManager).
"""

from pyspark.sql import functions as F

from beametrics_spark.config import FilterCondition, MetricConfig, MetricDefinition


def _final_plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def _single_cfg(dynamic=False):
    return MetricConfig(
        metric_definition=MetricDefinition(
            name="m",
            type="count",
            dynamic_labels={"event_type": "event_type", "k": "k"} if dynamic else {},
        ),
        filter_conditions=[],
    )


def test_fanout_single_config_no_generate(spark, events):
    """The reference's own deployment shape (one MetricConfig) must not
    pay an explode: no Generate, no ArrayFilter/lambda in the plan."""
    from beametrics_spark.pipeline import build_metrics_pipeline

    out = build_metrics_pipeline(events, [_single_cfg(dynamic=True)], window_size=60)
    out.collect()
    plan = _final_plan(out)
    assert "Generate" not in plan, plan
    assert "filter(" not in plan and "lambdafunction" not in plan.lower(), plan


def test_fanout_multi_config_post_explode_filter(spark, events):
    """Multi-config keeps the single-scan explode, but the null-entry
    drop must be a plain Filter AFTER the Generate — no ArrayFilter HOF
    (interpreted) on the pre-explode array."""
    from beametrics_spark.pipeline import build_metrics_pipeline

    cfgs = [
        MetricConfig(
            metric_definition=MetricDefinition(name="errors", type="count"),
            filter_conditions=[FilterCondition("event_type", "error", "equals")],
        ),
        MetricConfig(
            metric_definition=MetricDefinition(name="big", type="sum", field="value"),
            filter_conditions=[FilterCondition("value", 100, "greater_than")],
        ),
    ]
    out = build_metrics_pipeline(events, cfgs, window_size=60)
    out.collect()
    plan = _final_plan(out)
    assert "Generate explode" in plan, plan
    assert "lambdafunction" not in plan.lower(), plan
    # both simple predicates still reach the scan as a pushed disjunction
    # (the bare 'PushedFilters: [' disjunct ADVICE r10 flagged matched
    # empty lists too — only the Or() form proves the pushdown)
    assert "PushedFilters: [Or(" in plan, plan


def test_fanout_single_and_multi_agree(spark, events):
    """The fast path must compute exactly what the explode path computes:
    run the same config through both shapes (alone = fast path; padded
    with a never-matching sibling = explode path) and compare."""
    from beametrics_spark.pipeline import build_metrics_pipeline

    cfg = MetricConfig(
        metric_definition=MetricDefinition(name="errors", type="count"),
        filter_conditions=[FilterCondition("event_type", "error", "equals")],
    )
    never = MetricConfig(
        metric_definition=MetricDefinition(name="never", type="count"),
        filter_conditions=[FilterCondition("event_type", "no_such_type", "equals")],
    )
    single = build_metrics_pipeline(events, [cfg], window_size=60)
    multi = build_metrics_pipeline(events, [cfg, never], window_size=60)
    s = sorted(
        (r["window_start"], r["value"]) for r in single.collect()
    )
    m = sorted(
        (r["window_start"], r["value"])
        for r in multi.filter(F.col("metric_id") == 0).collect()
    )
    assert s == m and len(s) > 0


def test_tpch_q2_filters_below_aggregate(spark, sf_dir):
    """Both broadcast semi joins (wanted parts, EUROPE suppliers) must
    appear BELOW the (l_partkey, l_suppkey) min aggregate — the r3 shape
    aggregated the whole fact table first."""
    from beametrics_spark.operators.relational6 import tpch_q2_min_cost_supplier

    df = tpch_q2_min_cost_supplier(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    agg = plan.find("HashAggregate")
    # guard the positional check: find() returning -1 would make the
    # comparison below vacuously true (ADVICE r10)
    assert agg != -1, plan
    semis = [
        i
        for i in range(len(plan))
        if plan.startswith("BroadcastHashJoin", i) and "LeftSemi" in plan[i : i + 120]
    ]
    assert len(semis) >= 2, plan
    # the first (outermost) HashAggregate in the string is the offers
    # min; both semi joins must sit deeper (later in the tree dump)
    assert all(s > agg for s in semis[:2]), plan


def test_stream_cdc_mor_matches_batch_reconcile(spark, sf_dir):
    """Append-per-micro-batch + one read-side LWW reconcile must equal
    the one-shot batch reconcile (same oracle, same checksum)."""
    from beametrics_spark.operators.curation3 import cdc_merge_on_read_audit
    from beametrics_spark.operators.stream_parity import stream_cdc_mor_parity

    batch = {tuple(r) for r in cdc_merge_on_read_audit(spark, sf_dir).collect()}
    streamed = {tuple(r) for r in stream_cdc_mor_parity(spark, sf_dir).collect()}
    assert batch == streamed and len(batch) > 0


def test_ivf_training_releases_caches(spark, sf_dir):
    """After train_ivf_centroids returns, no per-round Lloyd cache may
    remain registered (ADVICE r9: each call leaked `iters` cached
    k-row tables)."""
    from beametrics_spark.operators.ivf import train_ivf_centroids
    from beametrics_spark.sources import load_table

    spark.catalog.clearCache()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = train_ivf_centroids(spark, emb, dim=64)
    assert len(cents) > 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_mor_compaction_roundtrip_matches_reconcile(spark, sf_dir):
    """Compaction (reconcile -> parquet write -> read back) must audit
    identically to the pure read-side reconcile: same counts, same
    content checksum — the invariant a compactor proves before swapping
    the log away."""
    from beametrics_spark.operators.curation3 import (
        cdc_merge_on_read_audit,
        cdc_mor_compaction_audit,
    )

    reconcile = {tuple(r) for r in cdc_merge_on_read_audit(spark, sf_dir).collect()}
    compacted = {tuple(r) for r in cdc_mor_compaction_audit(spark, sf_dir).collect()}
    assert reconcile == compacted and len(reconcile) > 0
