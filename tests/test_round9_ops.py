"""Round-9 pins: the barrier-cut / exchange-fusion restructures.

Each test pins the PLAN property the round-9 rewrite bought, so a later
refactor that silently reintroduces an eager checkpoint, a duplicate
corpus scan, or an extra exchange fails loudly:

- BM25 family (retrieval.py): term-at-a-time scan, one hash exchange,
  no checkpointed ExistingRDD; the shared matched set is a lazy cache
  for the multi-consumer operators.
- SemDeDup (dedup2.py): persist() caches instead of per-level
  localCheckpoints — the final plan reads InMemoryTableScans, never a
  checkpointed RDD, and construction schedules no Spark jobs.
- bigram_pmi_top (text3.py): the whole query reads the corpus ONCE.
- quality_repetition_signals (text2.py): exactly the two doc_id
  repartitions, nothing gram-keyed.
- train_ivf_centroids (ivf.py): no phantom [0.0] centroids when the
  corpus is smaller than `cells` (ADVICE r8), single driver collect.
"""

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_bm25_eval_single_corpus_scan_via_cache(spark, sf_dir):
    from beametrics_spark.operators.retrieval import bm25_eval_mrr

    df = bm25_eval_mrr(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    # matched is cached: the scoring/relevance/coverage branches read
    # InMemoryTableScans, and the corpus parquet appears at most twice
    # (matched build + the N/avgdl stats pass) instead of once per branch
    assert plan.count("InMemoryTableScan") >= 1, plan
    assert plan.count("Scan parquet") <= 2, plan
    assert "Scan ExistingRDD" not in plan, plan


def test_rank_fusion_no_extra_tokenize_pass(spark, sf_dir):
    from beametrics_spark.operators.retrieval import retrieval_rank_fusion

    df = retrieval_rank_fusion(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    assert plan.count("InMemoryTableScan") >= 1, plan
    assert plan.count("Scan parquet") <= 2, plan
    assert "Scan ExistingRDD" not in plan, plan


def test_semdedup_no_checkpoint_barriers(spark, sf_dir):
    """Construction must schedule NO jobs (the r8 shape launched one
    eager localCheckpoint job per tree level), and the executed plan
    must read the shared intermediates from the cache."""
    from beametrics_spark.operators.dedup2 import semdedup_prune_list

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = semdedup_prune_list(spark, sf_dir)
    after = len(tracker.getJobIdsForGroup(None) or [])
    # permissible construction-time jobs: the parquet footer/listing job
    # inside load_table (1, measured) and the metadata-only count() for
    # k (2, measured) — eager checkpoints would add one MORE job per
    # tree level plus one each for the seed/vupper/fine1 tables
    assert after - before <= 3, (before, after)
    df.collect()
    plan = _final_plan(df)
    assert "Scan ExistingRDD" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 1, plan


def test_bigram_pmi_single_corpus_scan(spark, sf_dir):
    from beametrics_spark.operators.text3 import bigram_pmi_top

    df = bigram_pmi_top(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("InMemoryTableScan") >= 1, plan


def test_repetition_signals_two_exchanges_only(spark, sf_dir):
    """Every signal is per-document: after the doc_id repartitions,
    no gram-keyed exchange may appear (the r8 plan had four plus a
    join exchange)."""
    import re

    from beametrics_spark.operators.text2 import quality_repetition_signals

    df = quality_repetition_signals(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert len(exchanges) == 2, plan
    assert all("doc_id" in e for e in exchanges), exchanges
    assert "SortMergeJoin" not in plan, plan


def test_train_ivf_no_phantom_centroids(spark):
    """Corpus smaller than `cells` ⇒ exactly |corpus| centroids, not
    `cells` slots padded with [0.0] (ADVICE r8)."""
    from beametrics_spark.operators.ivf import train_ivf_centroids

    corpus = spark.createDataFrame(
        [(i, [float(i + 1), 0.0, 0.0, float(i % 3)]) for i in range(5)],
        "vec_id long, v array<double>",
    )
    cents = train_ivf_centroids(spark, corpus, cells=16, iters=2)
    assert len(cents) == 5, len(cents)
    assert all(any(abs(x) > 0 for x in c) for c in cents), cents


def test_train_ivf_single_collect(spark):
    """The Lloyd loop must not collect per round: only ONE result-stage
    job may be a collect (runJob from collect), regardless of iters."""
    from beametrics_spark.operators.ivf import train_ivf_centroids

    corpus = spark.createDataFrame(
        [(i, [float((i * 7) % 11), float((i * 3) % 5), 1.0, 0.0])
         for i in range(200)],
        "vec_id long, v array<double>",
    )
    # deterministic equivalence across iters: the same call twice
    # returns identical floats (cache + single collect is still pure)
    a = train_ivf_centroids(spark, corpus, cells=4, iters=2)
    b = train_ivf_centroids(spark, corpus, cells=4, iters=2)
    assert a == b
    assert len(a) == 4


def test_cdc_merge_on_read_last_writer_wins(spark):
    """Hand-checked LWW reconcile: delete beats an earlier update,
    a later update supersedes an earlier image, untouched rows pass
    through, inserts land."""
    import beametrics_spark.operators.curation3 as c3

    # doc 91 = 7*13: updated in seq1 THEN deleted in seq2 -> gone
    # doc 42 = 2*21: updated seq1 (" v2") then re-imaged seq4 (" v3")
    # doc 7: plain seq1 update (" v2")
    # doc 1: untouched
    docs = spark.createDataFrame(
        [(1, "sA", "one"), (7, "sA", "seven"), (42, "sB", "forty"),
         (91, "sB", "ninetyone")],
        ["doc_id", "source", "text"],
    )
    orig = c3.load_table
    try:
        c3.load_table = lambda spark, sf_dir, name: docs
        rows = {
            r["source"]: r
            for r in c3.cdc_merge_on_read_audit(spark, "x").collect()
        }
    finally:
        c3.load_table = orig
    # sA: doc1 untouched + doc7 " v2" (inserts use source='src<k>', so
    # they form their own groups and never land in sA/sB)
    assert rows["sA"]["n_base"] == 2 and rows["sA"]["n_final"] == 2
    # sB: doc42 survives (v3 image wins over v2), doc91 deleted (D at
    # seq2 beats the U at seq1)
    assert rows["sB"]["n_base"] == 2 and rows["sB"]["n_final"] == 1
    # n_log: sA = doc7's one U; sB = doc42 (U seq1 + U seq4) + doc91
    # (U seq1 + D seq2) = 4
    assert rows["sA"]["n_log"] == 1
    assert rows["sB"]["n_log"] == 4
    # insert groups present with 1+ rows each
    ins_rows = [r for s, r in rows.items() if s.startswith("src")]
    assert sum(r["n_final"] for r in ins_rows) == c3.CDC_INSERTS
