"""IVF (inverted-file) approximate nearest neighbor — the scale path for
similarity search when hyperplane LSH prunes poorly (near-uniform
corpora: random vectors are near-orthogonal, so sign-bit signatures
carry little locality — measured recall ≈0.4 on the test embeddings).

Classic IVF: a coarse quantizer (k-means) partitions the corpus into C
cells; a query probes only the nprobe nearest cells and scores those
candidates exactly. Cost ≈ nprobe/C of brute force, recall degrades
gracefully with nprobe.

Spark-first and fully deterministic (no RNG — seeds are the first
`cells` corpus vectors under an xxhash64(vec_id) ordering, planned as
TakeOrderedAndProject; see train_ivf_centroids). Scoring crosses the
vectors with a BROADCAST (cell, centroid-array) table and evaluates one
unrolled codegen dot chain per (vector, cell) row — n×C narrow rows
(see _top_cells for why this beats both the posexplode+dim-join
formulation and a single all-cells projection). Lloyd mean updates are
per-dimension hash aggregations over a localCheckpointed exploded
corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import dot_expr, norm_expr
from beametrics_spark.operators.similarity import N_QUERIES, TOP_K
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

# Sweep at sf0.01 (recall @ fraction of corpus scored, vs brute force):
# nprobe=6 → 0.64 @ 0.37; nprobe=8 → 0.78 @ 0.50. Extra Lloyd iterations
# (2→4) move recall <±0.02 — the test embeddings are near-uniform, so
# cells can't tighten. On CLUSTERED data the same machinery prunes hard:
# the planted-Gaussian-mixture sweep (scripts/ann_sweep.py --clustered,
# floors pinned in tests/test_ann_clustered.py) measures
#   nprobe=2 → recall 0.96 @ 0.14 scan;  nprobe=3 → 1.00 @ 0.19 scan
# with ≥0.95 cell/cluster purity — real-world embedding corpora look
# like the clustered fixture, not the uniform one. Expose both knobs.
N_CELLS = 16
N_PROBE = 8
LLOYD_ITERS = 2


def _norm(v: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def _centroid_df(spark: SparkSession, centroids: list[list[float]]) -> DataFrame:
    """One row per centroid as (cell, cv: array<double>) — broadcast
    into the scoring cross joins."""
    rows = [(c, [float(x) for x in vec]) for c, vec in enumerate(centroids)]
    return spark.createDataFrame(rows, "cell int, cv array<double>")


def _top_cells(
    corpus: DataFrame, cent: DataFrame, ranks: int, *, payload: list[str] | None = None
) -> DataFrame:
    """(vec_id, v) × broadcast (cell, cv) → per-vector top `ranks`
    cells by dot product, ties to the lowest cell id.

    ``payload`` names extra input columns carried THROUGH the window to
    the output (e.g. the vector itself, its norm) — the pre-expansion
    repartition already satisfies the window's required distribution,
    so the ×C expansion, rank filter, and payload all stay within
    partitions: carrying the vector costs no shuffle bytes, and callers
    skip the n-row re-join they previously needed to get ``v`` back
    (VERDICT r7 #1 — each join was an extra exchange, and in the audit
    an extra sequential stage).

    One unrolled codegen dot chain per (vector, cell) row — n×C narrow
    rows, no wide intermediate. This replaced the posexplode + dim-join
    + hash-agg formulation (n×D rows expanded to n×D×C join outputs):
    measured ~2× faster on the sf1 audit training pass (5.9 s → 3.2 s
    per train call), because the scored relation shrinks from n·D·C
    rows to n·C. (The third formulation — a single projection holding
    all C dot chains — spends minutes in whole-stage-codegen
    compilation at C≥16 and is the worst of the three.) The chain adds
    left-to-right, the same order as DuckDB's list_dot_product, which
    the audit oracle relies on.

    Repartitioning by vec_id BEFORE the ×C expansion does double duty:
    it spreads the scoring across tasks when the scan has few splits
    (the sf1 corpus is one parquet file → one task otherwise), and it
    pre-satisfies the argmax window's required distribution so the
    shuffle moves n narrow (id, vector) rows instead of n×C scored
    rows (measured 1.4 s → 0.8 s on the sf1 assignment).
    """
    from beametrics_spark.operators.dedup import dot_expr

    w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("cell"))
    # explicit partition count: AQE would coalesce the small
    # pre-expansion exchange by BYTES (vectors are ~0.5 KB/row), wasting
    # the cores the ×C dot-product expansion needs
    n_part = corpus.sparkSession.sparkContext.defaultParallelism
    keep = ["vec_id", *(payload or [])]
    return (
        corpus.repartition(n_part, F.col("vec_id"))
        .crossJoin(F.broadcast(cent))
        .select(*keep, "cell", dot_expr("v", "cv").alias("dot"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ranks)
        .select(*keep, "cell")
    )


def assign_cells(
    spark: SparkSession, corpus: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """vec_id → argmax-dot-product cell, via broadcast cross join +
    per-vector argmax window (see _top_cells for the plan rationale).

    Vectors are compared un-normalized against normalized centroids —
    argmax of dot ≡ argmax of cosine for a fixed vector. Ties break on
    the lowest cell id (deterministic).
    """
    return _top_cells(corpus.select("vec_id", "v"), _centroid_df(spark, centroids), 1)


def probe_cells(
    spark: SparkSession,
    queries: DataFrame,
    centroids: list[list[float]],
    *,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """query vec_id → its nprobe highest-dot-product cells, fully distributed.

    Same shape as assign_cells but keeping the top nprobe ranks instead
    of rank 1 — the query side scales to a query TABLE (no .collect(),
    no driver loop). Argmax-dot against normalized centroids ≡
    argmax-cosine for a fixed query vector, so queries join
    un-normalized; ties break on the lowest cell id.
    """
    return _top_cells(
        queries.select("vec_id", "v"), _centroid_df(spark, centroids), nprobe
    )


def train_ivf_centroids(
    spark: SparkSession,
    corpus: DataFrame,
    *,
    cells: int = N_CELLS,
    iters: int = LLOYD_ITERS,
    seed_hash=None,
    dim: int | None = None,
) -> list[list[float]]:
    """Deterministic k-means on the corpus; returns C×D floats.

    Centroids live on the driver (KB-scale); assignment and
    per-dimension means are distributed DataFrame work.

    ``seed_hash(vec_id_col)`` overrides the seed-pick ordering hash;
    the audit query passes a pure-arithmetic Knuth multiplicative hash
    so an independent SQL engine can replicate the seeds exactly
    (xxhash64 is Spark-specific).

    ``dim`` (when the caller knows the fixed vector width) switches the
    Lloyd mean to ONE elementwise hash aggregate — ``avg(v[i])`` per
    dimension, whole-stage codegen, C groups through a single exchange
    — instead of the generic posexplode → (cell, dim) agg → (cell) agg
    chain, which costs two exchanges and an n×D row explosion per
    iteration. Callers with variable-width corpora (the clustered test
    fixtures are 32-dim) leave it None.
    """
    # Deterministic seed pick WITHOUT a global sort: order by a hash of
    # the id and take the first `cells` — Spark plans orderBy+limit as
    # TakeOrderedAndProject (per-partition top-k, merged on the driver),
    # so seeding a petabyte corpus never shuffles it. The hash spreads
    # seeds uniformly even when ids are clustered (the previous
    # stride-sample ran row_number over a single-partition global sort).
    #
    # The seed pick is FUSED into the first Lloyd aggregate (VERDICT r7
    # #1): iteration 0 uses the limit-`cells` seed table in-plan
    # (normalized with a HOF over `cells` rows — off the hot path) as
    # the broadcast centroid side, and the driver's one collect per
    # iteration pulls `cells` rows of (seed, trained-mean-or-null). On a
    # cluster each removed collect is a scheduling round-trip.
    order = (
        seed_hash(F.col("vec_id"))
        if seed_hash is not None
        else F.xxhash64("vec_id")
    )
    nrm = norm_expr("v")
    seedsn = (
        corpus.orderBy(order, "vec_id")
        .limit(cells)
        .withColumn("cell", F.row_number().over(Window.orderBy(order, "vec_id")) - 1)
        .select("cell", "v", F.transform("v", lambda x: x / nrm).alias("cv"))
    )
    # Lloyd mean: the assignment window CARRIES the vector payload (see
    # _top_cells) so the posexplode feeds the (cell, dim) partial
    # aggregation in the same stage (map-side combine down to C·D
    # groups) with no corpus re-join — the only shuffled relations are
    # n narrow rows pre-expansion and the C·D partials, never the n·D
    # exploded rows (VERDICT r6 #4, tightened r7 #1).
    #
    # Round-9 (VERDICT r8 #8): centroids stay DISTRIBUTED between Lloyd
    # rounds. Each round's (cell, cv) table is a lazy k-row persist()
    # consumed by both the next round's broadcast assignment and that
    # round's empty-cell fallback join, and the driver sees exactly ONE
    # collect at the very end — the r8 loop collected once per round (a
    # cluster scheduling round-trip each). The mean is re-normalized
    # in-plan (HOF transform over ≤cells rows, off the hot path) with
    # the same left-to-right square chain and zero-norm⇒1 guard the old
    # driver-side _norm applied, so the returned floats are
    # bit-identical. The final list is sized by the COLLECTED rows, not
    # pre-sized to `cells`: a corpus with fewer rows than `cells` yields
    # exactly that many centroids, no phantom [0.0] slots (ADVICE r8).
    from pyspark import StorageLevel

    cur = seedsn.select("cell", "cv")
    cached_rounds = []
    for _ in range(iters):
        # each round reads its INPUT twice (assignment broadcast +
        # fallback join) — cache it; the last round's OUTPUT has a
        # single consumer (the collect), so it stays uncached
        cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
        cached_rounds.append(cur)
        assigned = _top_cells(
            corpus.select("vec_id", "v"), cur, 1, payload=["v"]
        )
        if dim is not None:
            # one F.expr parse (single py4j round-trip — the 64-call
            # Column-API listcomp alone cost ~0.7 s of driver time)
            mv = "array(" + ", ".join(f"avg(v[{i}])" for i in range(dim)) + ")"
            means = assigned.groupBy("cell").agg(F.expr(mv).alias("mv"))
        else:
            means = (
                assigned.select("cell", F.posexplode("v").alias("dim", "val"))
                .groupBy("cell", "dim")
                .agg(F.avg("val").alias("m"))
                .groupBy("cell")
                .agg(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("ms")
                )
                .select("cell", F.transform("ms", lambda s: s["m"]).alias("mv"))
            )
        mraw = norm_expr("mv", dim)
        mnrm = F.when(mraw == 0.0, F.lit(1.0)).otherwise(mraw)
        cur = (
            cur.join(means, "cell", "left")
            .withColumn("_n", mnrm)
            .select(
                "cell",
                F.coalesce(
                    F.transform("mv", lambda x: x / F.col("_n")), F.col("cv")
                ).alias("cv"),
            )
        )
    rows = sorted(cur.collect(), key=lambda r: r["cell"])
    # release every round's k-row cache now that training materialized —
    # repeated calls (the recall audit, bench trials) otherwise leak
    # `iters` cached tables per call into the CacheManager (ADVICE r9).
    # Unpersisting MID-loop would be wrong: nothing executes until the
    # collect above, so an earlier round's cache dropped before
    # materialization forces exponential recomputation of the lineage.
    for c in cached_rounds:
        c.unpersist(blocking=False)
    return [list(r["cv"]) for r in rows]


@register("ann_cosine_topk_ivf", None)
def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: probe the N_PROBE nearest of N_CELLS cells, exact re-rank.

    Rows-only (approximate recall by design);
    tests/test_ivf.py::test_ivf_recall_and_pruning asserts recall ≥ 0.5
    vs the brute-force oracle AND that the candidate set actually pruned
    (< 90% of the corpus scored);
    tests/test_ivf.py::test_ivf_deterministic pins run-to-run stability.
    """
    # same one-materialization rule as ann_ivf_recall_audit below
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("vec_id")
        )
        .localCheckpoint(eager=True)
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    centroids = train_ivf_centroids(spark, corpus, dim=64)

    # norms hoisted out of the candidate scoring: each is computed once
    # per VECTOR / per QUERY instead of per candidate pair, so the
    # n×nprobe/C scoring stage pays one dot chain per row, not three;
    # the assignment window CARRIES (v, nv) so no corpus re-join
    cent = _centroid_df(spark, centroids)
    assigned = _top_cells(
        corpus.select("vec_id", "v", norm_expr("v").alias("nv")),
        cent,
        1,
        payload=["v", "nv"],
    )
    # query → nprobe nearest cells, distributed (scales to a query TABLE;
    # no .collect() of query vectors, no driver-side ranking loop)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    probes = _top_cells(
        queries.select("vec_id", "v", norm_expr("v").alias("nq")),
        cent,
        N_PROBE,
        payload=["v", "nq"],
    ).select(
        F.col("vec_id").alias("query_id"),
        "cell",
        F.col("v").alias("qv"),
        "nq",
    )
    candidates = assigned.join(F.broadcast(probes), "cell")
    scored = candidates.withColumn(
        "sim", dot_expr("qv", "v") / (F.col("nq") * F.col("nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), "rk")
    )


# --- driver-checkable IVF audit (VERDICT r5 #5) -------------------------------
# The production IVF entry above is rows-only (approximate by design,
# xxhash64 seeding is Spark-specific). This audit runs a REPLICABLE IVF
# — pure-arithmetic Knuth-hash seeding, one Lloyd iteration, 8 cells,
# nprobe 4 — in BOTH engines and reports per-query overlap between the
# IVF top-k and the exact brute-force top-k. Every stage of the IVF
# machinery (seed pick, Lloyd update, cell assignment, multi-cell
# probing, candidate re-rank) must agree with an independent SQL
# implementation for the integer overlap counts to hash-match.

AUDIT_CELLS = 8
AUDIT_NPROBE = 4
AUDIT_SEED_MULT = 2654435761  # Knuth multiplicative hash, mod 2^32


def _audit_seed_hash(vec_id: "F.Column"):
    return (vec_id * AUDIT_SEED_MULT) % F.lit(4294967296)


_IVF_AUDIT_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= {N_QUERIES}),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
seeds AS (
  SELECT row_number() OVER (ORDER BY (vec_id * {AUDIT_SEED_MULT}) % 4294967296,
                            vec_id) - 1 AS cell, v
  FROM corpus
  QUALIFY row_number() OVER (ORDER BY (vec_id * {AUDIT_SEED_MULT}) % 4294967296,
                             vec_id) <= {AUDIT_CELLS}
),
seedsn AS (
  SELECT cell,
         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y))))
           AS c
  FROM seeds
),
a0 AS (
  SELECT c.vec_id, s.cell,
         row_number() OVER (PARTITION BY c.vec_id
                            ORDER BY list_dot_product(c.v, s.c) DESC,
                                     s.cell ASC) AS rn
  FROM corpus c CROSS JOIN seedsn s
),
asg0 AS (SELECT vec_id, cell FROM a0 WHERE rn = 1),
dv AS (
  SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS val FROM corpus
),
md AS (
  SELECT a.cell, dv.dim, avg(dv.val) AS m
  FROM dv JOIN asg0 a USING (vec_id) GROUP BY 1, 2
),
cent AS (SELECT cell, list(m ORDER BY dim) AS c FROM md GROUP BY 1),
centn AS (
  SELECT cell,
         list_transform(c, x -> x / sqrt(list_sum(list_transform(c, y -> y*y))))
           AS c
  FROM cent
),
centf AS (
  SELECT s.cell, COALESCE(cn.c, s.c) AS c
  FROM seedsn s LEFT JOIN centn cn USING (cell)
),
a1 AS (
  SELECT c.vec_id, s.cell,
         row_number() OVER (PARTITION BY c.vec_id
                            ORDER BY list_dot_product(c.v, s.c) DESC,
                                     s.cell ASC) AS rn
  FROM corpus c CROSS JOIN centf s
),
asg1 AS (SELECT vec_id, cell FROM a1 WHERE rn = 1),
p AS (
  SELECT q.query_id, s.cell,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_dot_product(q.qv, s.c) DESC,
                                     s.cell ASC) AS rn
  FROM q CROSS JOIN centf s
),
probes AS (SELECT query_id, cell FROM p WHERE rn <= {AUDIT_NPROBE}),
cand AS (SELECT p.query_id, a.vec_id FROM probes p JOIN asg1 a USING (cell)),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                                     cand.vec_id ASC) AS rk
  FROM cand JOIN q USING (query_id) JOIN corpus c ON c.vec_id = cand.vec_id
),
ivf_top AS (SELECT query_id, vec_id FROM scored WHERE rk <= {TOP_K}),
bf AS (
  SELECT q.query_id, c.vec_id,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                                     c.vec_id ASC) AS rk
  FROM q CROSS JOIN corpus c
),
bf_top AS (SELECT query_id, vec_id FROM bf WHERE rk <= {TOP_K})
SELECT b.query_id,
       CAST(count(i.vec_id) AS BIGINT) AS n_overlap,
       ROUND(count(i.vec_id) / {TOP_K}.0, 4) AS recall_at_k
FROM bf_top b
LEFT JOIN ivf_top i ON i.query_id = b.query_id AND i.vec_id = b.vec_id
GROUP BY 1
"""


@register("ann_ivf_recall_audit", _IVF_AUDIT_ORACLE)
def ann_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall of a fully replicable IVF against the exact
    brute-force top-k — the hash-checkable certification of the IVF
    machinery (seeding, Lloyd update, assignment, probing, re-rank all
    agree with an independent DuckDB implementation, VERDICT r5 #5).
    Same distributed shapes as ann_cosine_topk_ivf: broadcast centroid
    tables, hash-agg dot products, per-query window top-k; the only
    differences are the SQL-replicable arithmetic seed hash and a
    pinned (cells=8, nprobe=4, iters=1) configuration.

    Round-8 restructure (VERDICT r7 #1 — this was the worst headline
    ratio at 39× DuckDB, from ~10 sequential driver actions each paying
    the local job floor / a cluster scheduling round-trip). Now THREE
    driver actions total:
      1. one eager localCheckpoint of the projected corpus,
      2. one training collect (seed pick fused into the Lloyd aggregate
         — see train_ivf_centroids),
      3. one fused result action: a SINGLE n×Q scoring expansion where
         IVF candidacy is a boolean flag (corpus cell ∈ the query's
         probed-cell set, broadcast as an array), and BOTH ranks come
         from one window pass over the same (query_id; sim desc,
         vec_id) sort — bf_rk as row_number, the IVF rank as a running
         count of candidate rows (equivalent to row_number restricted
         to candidates because the order is total). The old plan scored
         the corpus twice (IVF side + brute-force side), ran two window
         shuffles, and re-joined the two top-k sets; the overlap is now
         a per-row conjunction, and the final groupBy(query_id) reuses
         the window's partitioning — no further exchange.

    Round-13 floor decision (VERDICT r12 #7): re-measured under the
    fixed per-query-gc protocol, same box as the baseline worktree —
    sf0.1 2.26 s before vs 2.22-2.53 s across three after-runs
    (untouched code), sf1 2.68 vs 2.73 s (bench-protocol min-of-3,
    plans/r13/SF1_AB_r13.txt) = 2.32× same-box DuckDB. The r12 driver's
    4.77 s row and the r11→r12 swing were session aging (this audit
    sits late in bench order), which the per-query gc protocol removed.
    The training collect (k=8 rows) and the three-action shape above
    are the remaining cost; the train/assign/audit split offers no
    stage to cut without changing what the audit computes. DECLARED AT
    FLOOR.
    """
    # One materialization of the projected corpus (repartitioned first —
    # a single-file scan checkpoints into 1-2 partitions and starves the
    # xC scoring expansions): training and the fused result action both
    # re-read it, and without the lineage cut each re-runs the
    # scan->project subtree. The iterative-ML caching rule (MLlib
    # persists its input for the same reason); on a cluster this is a
    # persist to executor-local storage, sized n x D doubles.
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("vec_id")
        )
        .localCheckpoint(eager=True)
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    centroids = train_ivf_centroids(
        spark,
        corpus,
        cells=AUDIT_CELLS,
        iters=1,
        seed_hash=_audit_seed_hash,
        dim=64,
    )

    # norms hoisted out of the scoring stage (one dot chain per scored
    # row, not three) — the same dot/(nq*nv) factorization as
    # ann_cosine_topk_ivf; ranking is unchanged (identical products in
    # identical order as the oracle's list_cosine_similarity ranking)
    cent = _centroid_df(spark, centroids)
    assigned = _top_cells(
        corpus.select("vec_id", "v", norm_expr("v").alias("nv")),
        cent,
        1,
        payload=["v", "nv"],
    )
    # per-query probe set as ONE broadcast row: (query_id, pcells, qv,
    # nq). The query side is Q rows (tiny by construction) — probing
    # via collect_list + array_sort + slice costs a single small hash
    # aggregate instead of _top_cells' repartition + window pair, two
    # fewer sequential stages in the fused action. The struct sort key
    # (-dot, cell) reproduces the window's (dot DESC, cell ASC) order.
    dotc = dot_expr("v", "cv")
    qside = (
        queries.select("vec_id", "v", norm_expr("v").alias("nq"))
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "v", "nq", "cell", dotc.alias("dot"))
        .groupBy("vec_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct((-F.col("dot")).alias("nd"), F.col("cell"))
                    )
                ),
                1,
                AUDIT_NPROBE,
            ).alias("top"),
            F.first("v").alias("qv"),
            F.first("nq").alias("nq"),
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("top", lambda s: s["cell"]).alias("pcells"),
            "qv",
            "nq",
        )
    )
    scored = (
        assigned.crossJoin(F.broadcast(qside))
        .select(
            "query_id",
            "vec_id",
            (
                dot_expr("qv", "v") / (F.col("nq") * F.col("nv"))
            ).alias("sim"),
            F.array_contains("pcells", F.col("cell")).alias("is_cand"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    in_both = F.col("is_cand") & (F.col("ivf_rk") <= TOP_K)
    return (
        scored.withColumn("bf_rk", F.row_number().over(w))
        .withColumn("ivf_rk", F.sum(F.col("is_cand").cast("int")).over(wrun))
        .filter(F.col("bf_rk") <= TOP_K)
        .groupBy("query_id")
        .agg(F.sum(F.when(in_both, 1).otherwise(0)).alias("overlap_raw"))
        .select(
            "query_id",
            F.col("overlap_raw").cast("bigint").alias("n_overlap"),
            F.round(F.col("overlap_raw") / F.lit(float(TOP_K)), 4).alias(
                "recall_at_k"
            ),
        )
    )
