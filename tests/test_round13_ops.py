"""Round-13 pins: optimization-round internals equivalence + plan shape.

Every round-13 rewrite must compute the SAME rows as the shape it
replaced (the driver re-hashes all declared queries against the DuckDB
oracle), so each pin here compares the new internals against an inline
reimplementation of the old shape, or pins the plan property the
rewrite claims:

- countmin_error_audit: counters derived from the exact per-key table
  must equal the r6 d×|events| expand-then-aggregate counters.
- shingle_table: ONE exchange (hash(doc_id)) serves both the
  (doc_id, s) dedup and the per-doc count window.
- dedup2._argmax_pick: the max_by aggregate must select the same
  (id → fid, v) rows as the r7 row_number window it replaced,
  including the ties-to-lowest-fid rule.
- minhash_lsh_pairs verify phase: the single broadcast of the
  candidate shingle sets is REUSED by the second join (no duplicated
  gram build, no checkpoint barrier).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _final_plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


# --- countmin_error_audit: counters from exact == counters from events ------


def test_countmin_counters_equal_event_expansion(spark, sf_dir):
    from beametrics_spark.operators.dedup import md5_hash60
    from beametrics_spark.operators.scale_patterns import _CMS_D, _CMS_W
    from beametrics_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    buckets = [
        F.pmod(
            md5_hash60(
                F.concat(F.lit(f"cms{j}:"), F.col("user_id").cast("string"))
            ),
            F.lit(_CMS_W),
        ).alias(f"b{j}")
        for j in range(_CMS_D)
    ]
    hashes = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), buckets[j].alias("b"))
                for j in range(_CMS_D)
            ]
        )
    ).alias("x")
    # r6 shape: one (j, b) increment row per EVENT per hash function
    old = (
        ev.select("user_id", hashes)
        .select(F.col("x.j").alias("j"), F.col("x.b").alias("b"))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # r13 shape: counter cells as sums of per-key exact counts
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    new = (
        exact.select("user_id", "c", hashes)
        .select("c", F.col("x.j").alias("j"), F.col("x.b").alias("b"))
        .groupBy("j", "b")
        .agg(F.sum("c").alias("cnt"))
    )
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_countmin_single_events_scan(spark, sf_dir):
    from beametrics_spark.operators.scale_patterns import countmin_error_audit

    plan = _final_plan(countmin_error_audit(spark, sf_dir))
    # the r6 shape scanned events twice (counter increments + exact);
    # the only events access left is through the checkpointed exact
    # table, so the final plan must not read the parquet at all
    assert "events.parquet" not in plan


# --- shingle_table: one exchange under both dedup and window ----------------


def test_shingle_table_single_exchange(spark, sf_dir):
    from beametrics_spark.operators.dedup import shingle_table
    from beametrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _final_plan(shingle_table(docs))
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan
    # drift guard: the window and the dedup aggregate must still exist
    assert "windowspecdefinition" in plan, plan


# --- dedup2._argmax_pick == the r7 row_number window ------------------------


def _window_pick(scored, id_col):
    w = Window.partitionBy(id_col).orderBy(F.desc("_s"), F.asc("fid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "v", F.col("fid").alias("node"))
    )


def test_argmax_pick_matches_window(spark, sf_dir):
    from beametrics_spark.operators.dedup import dot_expr
    from beametrics_spark.operators.dedup2 import _argmax_pick, _unit
    from beametrics_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    roots = _unit(
        emb.limit(8).select(
            (F.col("vec_id") % 8).cast("int").alias("fid"),
            F.col("v"),
        ),
        "v",
        "fv",
    )
    scored = emb.crossJoin(F.broadcast(roots)).withColumn(
        "_s", dot_expr("v", "fv")
    )
    new = {
        r["vec_id"]: (r["node"], tuple(r["v"]))
        for r in _argmax_pick(scored, "vec_id").collect()
    }
    old = {
        r["vec_id"]: (r["node"], tuple(r["v"]))
        for r in _window_pick(scored, "vec_id").collect()
    }
    assert new == old and len(new) > 0


def test_argmax_pick_tie_to_lowest_fid(spark):
    # two centroids with IDENTICAL vectors -> equal dot scores; the
    # contract (row_number over _s desc, fid asc) keeps the LOWEST fid
    from beametrics_spark.operators.dedup2 import _argmax_pick

    items = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "vec_id long, v array<double>"
    )
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [1.0, 0.0])], "fid int, fv array<double>"
    )
    scored = items.crossJoin(F.broadcast(cents)).withColumn(
        "_s",
        F.col("v")[0] * F.col("fv")[0] + F.col("v")[1] * F.col("fv")[1],
    )
    picks = {r["vec_id"]: r["node"] for r in _argmax_pick(scored, "vec_id").collect()}
    assert picks == {1: 3, 2: 3}


def test_argmax_pick_partial_aggregates_before_exchange(spark, sf_dir):
    # the point of the rewrite: the r7 window shuffled the full n·B
    # candidate expansion then sorted it by (id, _s desc, fid); max_by
    # plans as SortAggregate (array-bearing buffer — see the docstring)
    # but its PARTIAL pass collapses each partition to one row per id
    # BEFORE the exchange, and no window/row_number pass remains
    from beametrics_spark.operators.dedup import dot_expr
    from beametrics_spark.operators.dedup2 import _argmax_pick, _unit
    from beametrics_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    roots = _unit(
        emb.limit(4).select(
            (F.col("vec_id") % 4).cast("int").alias("fid"), F.col("v")
        ),
        "v",
        "fv",
    )
    scored = emb.crossJoin(F.broadcast(roots)).withColumn(
        "_s", dot_expr("v", "fv")
    )
    plan = _final_plan(_argmax_pick(scored, "vec_id"))
    assert "partial_max_by" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "row_number" not in plan, plan


# --- minhash_lsh verify phase: one reused broadcast of the set table --------


def test_lsh_verify_reuses_sets_broadcast(spark, sf_dir):
    from beametrics_spark.operators.dedup import minhash_lsh_pairs
    from beametrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = minhash_lsh_pairs(docs)
    df.collect()  # AQE: reuse is visible in the final executed plan
    plan = _final_plan(df)
    n_sets_builds = plan.count("collect_set")
    # partial+final of ONE aggregate (2 mentions); the r6 two-projection
    # shape built the set table once per join side (4 mentions when the
    # checkpoint barrier is removed)
    assert 0 < n_sets_builds <= 2, plan


# --- cdc_mor compaction: no pinned core-count file fan-out ------------------


def test_mor_compaction_write_not_pinned_to_core_count(spark, sf_dir):
    # the audit's merged-snapshot write repartitions by doc_id WITHOUT a
    # pinned partition count, so AQE sizes the write; at test scale the
    # output must coalesce far below the r10 shape's defaultParallelism
    # fan-out (which wrote 1 near-empty file per core)
    import glob
    import shutil
    import tempfile

    from beametrics_spark.operators.curation3 import (
        mor_base_and_log,
        mor_merged,
    )

    base, log = mor_base_and_log(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="mor_pin_test_")
    try:
        mor_merged(base, log).repartition(F.col("doc_id")).write.mode(
            "overwrite"
        ).parquet(out)
        files = glob.glob(out + "/part-*.parquet")
        assert 0 < len(files) <= 4, files
    finally:
        shutil.rmtree(out, ignore_errors=True)


# --- dedup_substring_runs: xxhash64-pair keys == the r12 md5 dup set --------


def test_substring_runs_hash_pair_matches_md5_dup_set(spark, sf_dir):
    """The duplicated-occurrence set (doc_id, pos) under the round-13
    xxhash64-pair key + min/max dup test must equal the r12 shape's
    md5-string key + distinct/count shape (equal grams hash equal under
    both; 128-bit pair keeps collisions negligible)."""
    from beametrics_spark.operators.dedup import tokens_expr
    from beametrics_spark.operators.dedup2 import RUN_WIDTH as W
    from beametrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.select("doc_id", tokens_expr(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= W)
    )
    gram_len = F.col("n") - (W - 1)
    zipped = F.arrays_zip(
        *[F.slice("toks", i + 1, gram_len).alias(f"t{i}") for i in range(W)]
    )
    toks = [F.col("g")[f"t{i}"] for i in range(W)]
    base = d.select("doc_id", F.posexplode(zipped).alias("pos", "g"))

    # r12 shape: md5 string key, distinct -> count >= 2
    occ_old = base.select(
        "doc_id",
        "pos",
        F.md5(F.concat_ws(" ", *toks)).alias("h"),
    )
    dup_old = (
        occ_old.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    old = occ_old.join(dup_old, "h").select("doc_id", "pos")

    # r13 shape: hash-pair key, min != max
    occ_new = base.select(
        "doc_id",
        "pos",
        F.xxhash64(*toks).alias("h1"),
        F.xxhash64(F.lit("sr2:"), *toks).alias("h2"),
    )
    dup_new = (
        occ_new.groupBy("h1", "h2")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("h1", "h2")
    )
    new = occ_new.join(dup_new, ["h1", "h2"]).select("doc_id", "pos")

    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_substring_runs_hash_keys_partial_agg(spark, sf_dir):
    """No md5/string gram keys anywhere on the path, and the dup-gram
    aggregate must partially aggregate map-side (min/max of doc_id)
    BEFORE its exchange — the r12 shape's distinct-then-count shipped
    every occurrence twice."""
    from beametrics_spark.operators.dedup2 import dedup_substring_runs

    df = dedup_substring_runs(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    assert "md5" not in plan, plan
    assert "partial_min(doc_id" in plan, plan
    assert "xxhash64" in plan, plan


# --- boilerplate df >= 2 via min/max == count_distinct ----------------------


def test_boiler_dup_blocks_matches_count_distinct(spark, sf_dir):
    from beametrics_spark.operators.curation4 import (
        PASSAGE_WIDTH,
        boiler_block_occurrences,
        boiler_dup_blocks,
    )
    from beametrics_spark.operators.dedup import tokens_expr
    from beametrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", tokens_expr(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks"))
    blk = boiler_block_occurrences(d, PASSAGE_WIDTH)
    via_minmax = sorted(
        map(tuple, boiler_dup_blocks(blk).select("h1", "h2").collect())
    )
    via_distinct = sorted(
        map(
            tuple,
            blk.groupBy("h1", "h2")
            .agg(F.count_distinct("doc_id").alias("ddf"))
            .filter(F.col("ddf") >= 2)
            .select("h1", "h2")
            .collect(),
        )
    )
    assert via_minmax == via_distinct
    assert len(via_minmax) > 0  # fixtures must actually exercise the path


def test_boilerplate_mask_hash_keys_no_md5(spark, sf_dir):
    from beametrics_spark.operators.curation4 import boilerplate_block_mask

    df = boilerplate_block_mask(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    assert "md5" not in plan, plan
    assert "partial_min(doc_id" in plan, plan
