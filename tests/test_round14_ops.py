"""Round-14 pins: optimization-round internals equivalence + plan shape.

Each round-14 rewrite must compute the SAME rows as the shape it
replaced (the driver re-hashes all declared queries against the DuckDB
oracle); pins here compare new internals against an inline
reimplementation of the old shape, or pin the plan property the
rewrite claims:

- iterative graph family (pagerank / label_prop / kcore): the keyed
  edge table is exchanged ONCE per query (repartition("src") +
  persist) and every iteration reads the cache — no per-iteration edge
  re-shuffle; full-output equivalence against the r13 formulations
  (per-round localCheckpoint, row_number argmax, shrinking edge
  copies, string node keys).
- LPA argmax: min(struct(-wsum, lab)) == row_number window over
  (wsum DESC, lab ASC), including weighted-tally ties.
- kcore: filtering the ORIGINAL edges with the latest keep set equals
  peeling a shrinking edge copy (keep-set monotonicity).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _initial_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _one_cached_edge_relation(plan: str) -> bool:
    """Every InMemoryRelation print in the plan is the SAME cached edge
    relation (one keyed exchange feeds the whole query); the textual
    plan re-prints the cached build plan under every scan, so raw node
    counts cannot be compared — distinct relation signatures can."""
    import re

    rels = {
        re.sub(r"#\d+", "", s)
        for s in re.findall(r"InMemoryRelation \[[^\]]*\]", plan)
    }
    return len(rels) == 1


# --- one keyed edge exchange, iterations read the cache ----------------------


def test_pagerank_single_edge_exchange(spark, sf_dir):
    from beametrics_spark.operators.graph import N_ITER, pagerank_customer_supplier

    spark.catalog.clearCache()
    plan = _initial_plan(pagerank_customer_supplier(spark, sf_dir))
    assert _one_cached_edge_relation(plan)
    # every iteration reads the cache: round 1 aggregates it directly,
    # rounds 2..N join it — N scans total in the final-readout plan
    assert plan.count("InMemoryTableScan") == N_ITER


def test_lpa_single_edge_exchange(spark, sf_dir):
    from beametrics_spark.operators.graph3 import N_ITER, label_prop_communities

    spark.catalog.clearCache()
    plan = _initial_plan(label_prop_communities(spark, sf_dir))
    assert _one_cached_edge_relation(plan)
    # round 1 is the identity read of the cache, rounds 2..N join it
    assert plan.count("InMemoryTableScan") == N_ITER
    # the row_number argmax window is gone (min-struct aggregate)
    assert "Window" not in plan


def test_kcore_long_keys_no_node_strings(spark, sf_dir):
    from beametrics_spark.operators.graph3 import KCORE_ROUNDS, kcore_trade_graph

    spark.catalog.clearCache()
    plan = _initial_plan(kcore_trade_graph(spark, sf_dir))
    assert _one_cached_edge_relation(plan)
    # nodes stay parity-encoded longs end to end — the 'c:'/'s:' id
    # strings of the r13 shape are never built
    assert "c:" not in plan
    # the final-readout plan touches the cache only through the
    # checkpointed keep sets plus round-1's survivors distinct — the
    # shrinking edge copies of the r13 shape are never re-materialized
    assert plan.count("InMemoryTableScan") <= KCORE_ROUNDS


# --- full-output equivalence vs the r13 formulations -------------------------


def _old_pagerank(spark, sf_dir):
    from beametrics_spark.operators.graph import DAMPING, N_ITER, TOP_N
    from beametrics_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(lineitem, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = (
        raw.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w")
        .unionAll(raw.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w"))
        .localCheckpoint(eager=True)
    )
    nodes = edges.select("src").distinct().withColumnRenamed("src", "node")
    n = nodes.count()
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    contrib = edges.join(outw, "src").localCheckpoint(eager=True)
    rank = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(N_ITER):
        rank = (
            contrib.join(rank, rank["node"] == contrib["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit((1 - DAMPING) / n)
                    + DAMPING * F.sum(F.col("pr") * F.col("w") / F.col("outw"))
                ).alias("pr")
            )
            .localCheckpoint(eager=True)
        )
    scored = rank.select("node", F.round("pr", 9).alias("pagerank"))
    return scored.orderBy(F.desc("pagerank"), F.asc("node")).limit(TOP_N)


def test_pagerank_matches_r13_shape(spark, sf_dir):
    from beametrics_spark.operators.graph import pagerank_customer_supplier

    spark.catalog.clearCache()
    assert _rows(pagerank_customer_supplier(spark, sf_dir)) == _rows(
        _old_pagerank(spark, sf_dir)
    )


def _old_lpa(spark, sf_dir):
    from beametrics_spark.operators.graph3 import N_ITER, TOP_N
    from beametrics_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(lineitem, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = (
        raw.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w")
        .unionAll(raw.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w"))
        .localCheckpoint(eager=True)
    )
    labels = edges.select(
        F.col("src").alias("node"), F.col("src").alias("lab")
    ).distinct()
    w_arg = Window.partitionBy("node").orderBy(F.desc("wsum"), F.asc("lab"))
    for _ in range(N_ITER):
        labels = (
            edges.join(labels, labels["node"] == edges["src"])
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.sum("w").alias("wsum"))
            .withColumn("rn", F.row_number().over(w_arg))
            .filter(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), F.asc("community"))
        .limit(TOP_N)
    )


def test_lpa_matches_r13_shape(spark, sf_dir):
    from beametrics_spark.operators.graph3 import label_prop_communities

    spark.catalog.clearCache()
    assert _rows(label_prop_communities(spark, sf_dir)) == _rows(
        _old_lpa(spark, sf_dir)
    )


def _old_kcore(spark, sf_dir):
    from beametrics_spark.operators.graph3 import KCORE_K, KCORE_ROUNDS
    from beametrics_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(lineitem, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = (
        raw.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(raw.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .localCheckpoint(eager=True)
    )
    side = lambda col: F.when(F.col(col).startswith("c:"), F.lit("c")).otherwise(
        F.lit("s")
    )
    removals = []
    cur = edges
    survivors = (
        edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    )
    for i in range(1, KCORE_ROUNDS + 1):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = (
            deg.filter(F.col("d") >= KCORE_K)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=True)
        )
        removed = (
            survivors.join(keep, "node", "left_anti")
            .groupBy(side("node").alias("side"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(i).alias("round"), "side", "n")
        )
        removals.append(removed)
        cur = (
            cur.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        survivors = keep
    core = (
        survivors.groupBy(side("node").alias("side"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(KCORE_ROUNDS + 1).alias("round"), "side", "n")
    )
    x = removals[0]
    for r in removals[1:]:
        x = x.unionAll(r)
    x = x.unionAll(core)
    scaffold = spark.createDataFrame(
        [(r, sd) for r in range(1, KCORE_ROUNDS + 2) for sd in ("c", "s")],
        "round int, side string",
    )
    return scaffold.join(x, ["round", "side"], "left").select(
        "round", "side", F.coalesce("n", F.lit(0)).alias("n_nodes")
    )


def test_kcore_matches_r13_shape(spark, sf_dir):
    from beametrics_spark.operators.graph3 import kcore_trade_graph

    spark.catalog.clearCache()
    assert _rows(kcore_trade_graph(spark, sf_dir)) == _rows(
        _old_kcore(spark, sf_dir)
    )


# --- LPA argmax: min-struct == row_number window, ties included --------------


def test_lpa_argmax_tie_semantics(spark):
    # wsum ties resolved to the SMALLEST label string, exactly the
    # window's (wsum DESC, lab ASC) order; "c:100" < "c:2" < "c:25"
    rows = [
        ("n1", "c:2", 5),
        ("n1", "c:100", 5),
        ("n1", "c:25", 5),
        ("n1", "s:1", 4),
        ("n2", "s:9", 1),
        ("n2", "c:7", 1),
        ("n3", "s:3", 7),
        ("n3", "s:30", 8),
    ]
    tallies = spark.createDataFrame(rows, "node string, lab string, wsum long")
    got = (
        tallies.groupBy("node")
        .agg(F.min(F.struct((-F.col("wsum")).alias("_nw"), F.col("lab"))).alias("_m"))
        .select("node", F.col("_m.lab").alias("lab"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("wsum"), F.asc("lab"))
    want = (
        tallies.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("node", "lab")
    )
    assert _rows(got) == _rows(want) == [
        ("n1", "c:100"),
        ("n2", "c:7"),
        ("n3", "s:30"),
    ]


# --- minhash signature shape: narrow-sort-then-digest == r13 projection ------


def test_minhash_signatures_match_r13_shape(spark, sf_dir):
    from beametrics_spark.operators.dedup import gram_rows
    from beametrics_spark.operators.dedup3 import minhash_signatures_md5
    from beametrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    g = gram_rows(docs)
    # r13 shape: fat digest projection feeding a two-phase aggregate
    fp = F.md5(F.col("s"))
    dig = g.select(
        "doc_id",
        *[F.md5(F.concat(F.lit(f"{t}:"), fp)).alias(f"_d{t}") for t in range(16)],
    )
    old = dig.groupBy("doc_id").agg(
        *[
            F.min(F.substring(F.col(f"_d{i // 4}"), 1 + 8 * (i % 4), 8)).alias(
                f"h{i}"
            )
            for i in range(64)
        ]
    )
    assert _rows(minhash_signatures_md5(g)) == _rows(old)


# --- semdedup pair stage: sorted-slice triangle + grouped argmax -------------


def test_semdedup_pair_stage_matches_r13_shape(spark):
    import random

    from beametrics_spark.operators.dedup import dot_expr, norm_expr
    from beametrics_spark.operators.dedup2 import SEM_TAU

    rng = random.Random(7)
    rows = []
    for vid in range(60):
        # 3 clusters, vectors built to produce plenty of cos ties and
        # above-threshold pairs (duplicated base vectors)
        base = [[1.0] * 8, [0.5] * 8, [-0.25] * 8][vid % 3]
        v = [x + (0.01 * (vid // 20)) for x in base]
        rows.append((vid, vid % 3, v + [0.0] * 56))
    assigned = spark.createDataFrame(
        rows, "vec_id long, fid long, v array<double>"
    ).select("vec_id", "fid", "v", norm_expr("v").alias("nv"))

    dot = dot_expr("a.v", "b.v")

    def old_shape():
        from pyspark.sql import Window

        members = assigned.groupBy(F.col("fid").alias("cluster")).agg(
            F.collect_list(F.struct("vec_id", "v", "nv")).alias("ms")
        )
        pairs = (
            members.select("cluster", F.explode("ms").alias("a"), "ms")
            .select("cluster", "a", F.explode("ms").alias("b"))
            .filter(F.col("b.vec_id") > F.col("a.vec_id"))
            .select(
                "cluster",
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                (dot / (F.col("a.nv") * F.col("b.nv"))).alias("cos_ab"),
            )
            .filter(F.col("cos_ab") >= SEM_TAU)
        )
        w = Window.partitionBy("id_b").orderBy(F.desc("cos_ab"), F.asc("id_a"))
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("cluster").cast("long").alias("cluster"),
                F.col("id_b").alias("pruned_vec_id"),
                F.col("id_a").alias("keep_vec_id"),
                F.round("cos_ab", 6).alias("cos_sim"),
            )
        )

    def new_shape():
        members = assigned.groupBy(F.col("fid").alias("cluster")).agg(
            F.array_sort(F.collect_list(F.struct("vec_id", "v", "nv"))).alias("ms")
        )
        pairs = (
            members.select("cluster", F.posexplode("ms").alias("p", "a"), "ms")
            .select(
                "cluster",
                "a",
                F.explode(
                    F.slice("ms", F.col("p") + 2, F.size("ms") - F.col("p") - 1)
                ).alias("b"),
            )
            .select(
                "cluster",
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                (dot / (F.col("a.nv") * F.col("b.nv"))).alias("cos_ab"),
            )
            .filter(F.col("cos_ab") >= SEM_TAU)
        )
        return (
            pairs.groupBy("cluster", "id_b")
            .agg(
                F.max_by(
                    F.struct("id_a", "cos_ab"),
                    F.struct(F.col("cos_ab"), (-F.col("id_a")).alias("_ni")),
                ).alias("_p")
            )
            .select(
                F.col("cluster").cast("long").alias("cluster"),
                F.col("id_b").alias("pruned_vec_id"),
                F.col("_p.id_a").alias("keep_vec_id"),
                F.round("_p.cos_ab", 6).alias("cos_sim"),
            )
        )

    got, want = _rows(new_shape()), _rows(old_shape())
    assert got == want
    assert len(got) > 20  # the fixture actually exercises ties/pairs


# --- ntile-family default flips on a source-size estimate --------------------


def test_ntile_default_flips_on_size_estimate(spark, sf_dir, monkeypatch):
    from beametrics_spark.operators.mining import part_revenue_abc_classes
    from beametrics_spark.operators.text4 import quality_decile_token_budget

    import re

    def has_part_table_window(plan: str) -> bool:
        # the window branch's single-task cumulative sum orders the
        # REDUCED PART TABLE by (revenue DESC, l_partkey); the cutoff
        # branch's only windows run over the bounded per-bin aggregate
        # (functions.weighted_order_boundary_rows) — never a
        # part-cardinality sort
        return bool(re.search(r"windowspecdefinition\(revenue#\d+", plan))

    spark.catalog.clearCache()
    # local SFs sit far under the default threshold: window branch
    plan_small = _initial_plan(part_revenue_abc_classes(spark, sf_dir))
    assert has_part_table_window(plan_small)

    # a 1-byte threshold simulates the 100x-scale caller: the default
    # must route to the sortless cutoff branch with the SAME rows
    monkeypatch.setenv("SPARK_GRAFT_GLOBAL_SORT_MAX_BYTES", "1")
    flipped = part_revenue_abc_classes(spark, sf_dir)
    assert not has_part_table_window(_initial_plan(flipped))
    assert _rows(flipped) == _rows(
        part_revenue_abc_classes(spark, sf_dir, use_cutoff_classes=False)
    )

    deciles = quality_decile_token_budget(spark, sf_dir)
    assert "ntile" not in _initial_plan(deciles)
    assert _rows(deciles) == _rows(
        quality_decile_token_budget(spark, sf_dir, use_cutoff_deciles=False)
    )
