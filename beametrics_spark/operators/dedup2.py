"""Substring-granularity and semantic dedup — the second generation of
corpus dedup operators.

Document-level dedup (dedup.py: exact / Jaccard / MinHash-LSH /
SimHash) misses the dominant real-world contamination shape: two
mostly-different pages sharing a long verbatim span (boilerplate,
quoted passages, licence headers). The substring-level operators here
detect that shape the way the suffix-array dedup of "Deduplicating
Training Data Makes Language Models Better" (Lee et al., 2022) does —
find every maximal cross-document duplicated token run of length >= W
— but expressed Spark-first: positional shingle hashing + island
merging instead of a monolithic suffix array, because shingle tables
shard horizontally across executors while a suffix array does not.

Three operators:

1. dedup_substring_runs — per doc: how many maximal duplicated runs,
   how many tokens they cover (exact interval union), longest run.
2. passage_dedup_rate — Dolma-style fixed-width passage dedup (the
   corpus has no newlines, so passages are 16-token blocks rather than
   paragraphs): per source, what fraction of passages occur more than
   once corpus-wide.
3. semdedup_prune_list — SemDeDup (Abbas et al., 2023): cluster the
   embedding space, then prune near-duplicate pairs WITHIN each
   cluster only — the quadratic cosine step drops from O(n^2) to
   O(sum_c |c|^2), the property that makes semantic dedup feasible at
   100 TB where the all-pairs baseline (dedup_embedding_cosine) is
   guard-blocked.

The reference has no dedup machinery of any kind (SURVEY.md §2.2 — its
pipeline is filter→window→count, beametrics/pipeline.py:164-186);
these are part of the mandated LLM-scale extension surface.

Every shuffle in this module carries 16-byte md5 hashes or small ids —
never document bodies; the md5 keys are shared bit-for-bit with the
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

RUN_WIDTH = 8  # tokens; a duplicated run is >= RUN_WIDTH shared tokens
PASSAGE_WIDTH = 16  # tokens per non-overlapping passage block
SEM_MIN_CLUSTERS = 8  # SemDeDup cluster-count floor at tiny corpus sizes
SEM_TAU = 0.35  # within-cluster cosine prune threshold


# ---------------------------------------------------------------------------
# 1. cross-document duplicated substring runs
# ---------------------------------------------------------------------------

_SUBSTRING_RUNS_ORACLE = rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
         len(regexp_split_to_array(trim(text), '\s+')) AS n
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= {RUN_WIDTH}
),
occ AS (
  SELECT doc_id, n,
         unnest(generate_series(1, n - {RUN_WIDTH} + 1)) - 1 AS pos
  FROM d
),
hocc AS (
  SELECT o.doc_id, o.n, o.pos,
         md5(array_to_string(list_slice(d.toks, o.pos + 1, o.pos + {RUN_WIDTH}), ' ')) AS h
  FROM occ o JOIN d USING (doc_id)
),
dup AS (
  SELECT h FROM (SELECT DISTINCT h, doc_id FROM hocc)
  GROUP BY h HAVING count(*) >= 2
),
docc AS (SELECT o.doc_id, o.n, o.pos FROM hocc o JOIN dup USING (h)),
isl AS (
  SELECT doc_id, n, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM docc
),
runs AS (
  SELECT doc_id, n, min(pos) AS s, max(pos) + {RUN_WIDTH} - 1 AS e
  FROM isl GROUP BY doc_id, n, grp
),
flagged AS (
  SELECT doc_id, n, s, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS DISTINCT FROM NULL
               AND s <= max(e) OVER (PARTITION BY doc_id ORDER BY s
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS nf
  FROM runs
),
grp2 AS (
  SELECT doc_id, n, s, e,
         sum(nf) OVER (PARTITION BY doc_id ORDER BY s) AS cg
  FROM flagged
),
merged AS (
  SELECT doc_id, n, min(s) AS cs, max(e) AS ce
  FROM grp2 GROUP BY doc_id, n, cg
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(ce - cs + 1) AS BIGINT) AS dup_tokens,
       CAST(max(ce - cs + 1) AS BIGINT) AS longest_run_tokens,
       ROUND(sum(ce - cs + 1) * 1.0 / any_value(n), 4) AS dup_token_frac
FROM merged GROUP BY doc_id
"""


@register("dedup_substring_runs", _SUBSTRING_RUNS_ORACLE)
def dedup_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated token runs per doc (exact).

    Pipeline (no pair expansion ANYWHERE — this is what lets substring
    dedup run where the pairwise operators need LSH):

      1. positional shingles: every RUN_WIDTH-token gram with its start
         offset, hashed to md5 — arrays_zip/slice/posexplode, all
         whole-stage codegen; shuffles carry (16-byte hash, doc_id,
         int) rows only.
      2. cross-doc grams: a gram is duplicated iff its distinct-doc
         count >= 2 — two hash aggregations (distinct, then count),
         both map-side combinable; no posting-list materialization, so
         no HOT_GROUP_CAP is needed (a boilerplate gram shared by 10^6
         docs costs one counter, not 10^12 pairs).
      3. islands: consecutive duplicated gram offsets chain into runs
         (pos − row_number() grouping) under a per-doc window — the
         partition key is doc_id, so state per task is one document's
         gram list, bounded by doc length.
      4. exact cover: runs whose token intervals overlap (gap < W)
         merge via the classic running-max-end interval union, again
         per-doc windows. dup_tokens is the EXACT union size — summing
         raw run spans would double-count tokens shared by two runs.

    Output: one row per doc that contains at least one duplicated run.
    """
    from beametrics_spark.operators.dedup import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    W = RUN_WIDTH
    d = (
        docs.select("doc_id", tokens_expr(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= W)
    )
    gram_len = F.col("n") - (W - 1)
    zipped = F.arrays_zip(
        *[F.slice("toks", i + 1, gram_len).alias(f"t{i}") for i in range(W)]
    )
    occ = d.select(
        "doc_id", "n", F.posexplode(zipped).alias("pos", "g")
    ).select(
        "doc_id",
        "n",
        "pos",
        F.md5(F.concat_ws(" ", *[F.col("g")[f"t{i}"] for i in range(W)])).alias("h"),
    )

    dup_h = (
        occ.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h")
    )
    docc = occ.join(dup_h, "h").select("doc_id", "n", "pos")

    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    isl = docc.withColumn("grp", F.col("pos") - F.row_number().over(by_pos))
    runs = isl.groupBy("doc_id", "n", "grp").agg(
        F.min("pos").alias("s"), (F.max("pos") + W - 1).alias("e")
    )

    by_s = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        by_s.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = runs.withColumn(
        "nf",
        F.when(prev_max_e.isNotNull() & (F.col("s") <= prev_max_e), 0).otherwise(1),
    )
    merged = (
        flagged.withColumn("cg", F.sum("nf").over(by_s))
        .groupBy("doc_id", "n", "cg")
        .agg(F.min("s").alias("cs"), F.max("e").alias("ce"))
    )
    cover = F.col("ce") - F.col("cs") + 1
    return merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.sum(cover).alias("dup_tokens"),
        F.max(cover).alias("longest_run_tokens"),
        F.round(F.sum(cover) / F.first("n"), 4).alias("dup_token_frac"),
    )


# ---------------------------------------------------------------------------
# 2. passage-level dedup rate
# ---------------------------------------------------------------------------

_PASSAGE_DEDUP_ORACLE = rf"""
WITH d AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks,
         len(regexp_split_to_array(trim(text), '\s+')) AS n
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= {PASSAGE_WIDTH}
),
occ AS (
  SELECT doc_id, source,
         unnest(generate_series(1, n - {PASSAGE_WIDTH} + 1, {PASSAGE_WIDTH})) AS st
  FROM d
),
p AS (
  SELECT o.source,
         md5(array_to_string(list_slice(d.toks, o.st, o.st + {PASSAGE_WIDTH} - 1), ' ')) AS h
  FROM occ o JOIN d USING (doc_id)
),
cnt AS (SELECT h, count(*) AS c FROM p GROUP BY h)
SELECT p.source,
       CAST(count(*) AS BIGINT) AS n_passages,
       CAST(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
       ROUND(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_rate
FROM p JOIN cnt USING (h)
GROUP BY p.source
"""


@register("passage_dedup_rate", _PASSAGE_DEDUP_ORACLE)
def passage_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-passage rate, Dolma-paragraph-dedup shape.

    Documents split into NON-overlapping PASSAGE_WIDTH-token blocks
    (the corpus is newline-free word soup, so fixed blocks stand in for
    paragraphs; a real corpus would split on '\\n' first — same plan);
    a passage is duplicated iff its exact text occurs >= 2 times
    corpus-wide (including twice within one doc). Non-overlapping
    blocks mean the corpus expands ~1/P rows per token — compare the
    W-per-token expansion of the overlapping shingle operators — so
    this is the cheap screen that runs before run-level dedup.

    Two hash aggregations over md5 keys + one hash join (global count
    back to occurrences); all codegen, no UDF, nothing quadratic.
    """
    from beametrics_spark.operators.dedup import tokens_expr

    P = PASSAGE_WIDTH
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.select("doc_id", "source", tokens_expr(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= P)
    )
    occ = d.select(
        "source",
        "toks",
        F.explode(F.sequence(F.lit(1), F.col("n") - P + 1, F.lit(P))).alias("st"),
    ).select("source", F.md5(F.concat_ws(" ", F.slice("toks", F.col("st"), P))).alias("h"))
    cnt = occ.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        occ.join(cnt, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum((F.col("c") >= 2).cast("long")).alias("n_dup_passages"),
            F.round(
                F.sum((F.col("c") >= 2).cast("long")) / F.count(F.lit(1)), 4
            ).alias("dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# 3. SemDeDup — cluster-then-prune semantic dedup
# ---------------------------------------------------------------------------

_SEMDEDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seeds AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY ('0x' || substring(md5('sem:' || CAST(vec_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT
  LIMIT (SELECT GREATEST({SEM_MIN_CLUSTERS},
                         CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM e)
),
scored AS (
  SELECT e.vec_id, s.cid, list_cosine_similarity(e.v, s.cv) AS cs
  FROM e CROSS JOIN seeds s
),
assigned AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
    FROM scored
  ) WHERE rn = 1
),
ev AS (SELECT a.vec_id, a.cid, e.v FROM assigned a JOIN e USING (vec_id)),
pairs AS (
  SELECT a.cid AS cluster, a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(a.v, b.v) AS cos_ab
  FROM ev a JOIN ev b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= {SEM_TAU}
)
SELECT cluster, id_b AS pruned_vec_id, id_a AS keep_vec_id,
       ROUND(cos_ab, 6) AS cos_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY id_b ORDER BY cos_ab DESC, id_a) AS rn
  FROM pairs
) WHERE rn = 1
"""


@register("semdedup_prune_list", _SEMDEDUP_ORACLE)
def semdedup_prune_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: coarse-cluster the embeddings, prune cosine-near pairs
    within clusters only (Abbas et al., 2023 — the technique behind
    LAION/web-scale semantic dedup).

    Cluster count scales as k = max(8, ceil(sqrt(n))): assignment costs
    n·k and the within-cluster pair stage costs ~n²/k, so √n balances
    them at Θ(n^1.5) total — sub-quadratic, vs the guard-blocked O(n²)
    of dedup_embedding_cosine (a FIXED k leaves the pair stage n²/k,
    which the sf0.1→sf1 probe caught as 27x growth on 10x data before
    this scaling was added; with √n clusters + the unrolled codegen
    cosine the same decade measures 4.0x, 105 s → 5.5 s at sf1). At
    extreme scale the linear path is fixed-SIZE clusters
    (k ∝ n) with hierarchical/IVF assignment replacing the flat n×k
    argmax — that trained-quantizer machinery already exists in
    ivf.py (train_ivf_centroids + assign_cells) and composes with the
    pruning stage here unchanged.

    Cluster centers are a deterministic seed pick (k smallest md5 of
    'sem:'+vec_id — SQL-replicable, same device as the IVF coarse
    quantizer's xxhash64 seeding) rather than trained k-means: Lloyd
    refinement changes WHERE the cluster boundaries fall, not the
    mechanics being certified, and the trained-quantizer path is
    already covered by ann_ivf_recall_audit.

    Plan: one count() job fixes k (a single driver scalar — same
    budget as the convergence scalars in curation.py); the seed table
    (k rows, distributed TakeOrdered, never a global sort) broadcasts
    into a cosine-scored cross join (n×k rows, argmax window keyed by
    vec_id — the same shape as ivf.assign_cells); the within-cluster
    self-join shuffles on cluster id. Each pruned vector reports its
    single best keeper (max cosine, ties to the lowest keeper id), so
    downstream anti-join removal is one semi-join on pruned_vec_id.
    """
    import math

    from beametrics_spark.operators.dedup import (
        cosine_expr,
        dot_expr,
        md5_hash60,
        norm_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    k = max(SEM_MIN_CLUSTERS, math.isqrt(max(emb.count() - 1, 0)) + 1)
    seeds = (
        emb.withColumn(
            "hk", md5_hash60(F.concat(F.lit("sem:"), F.col("vec_id").cast("string")))
        )
        .orderBy("hk")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    # Repartition BEFORE the n×k expansion: the scoring projection is
    # the compute-heavy stage, and a single parquet file would
    # otherwise pin it to the scan's 1-2 input splits; hashing by
    # vec_id also pre-satisfies the argmax window's distribution, so
    # no second shuffle is introduced (the shuffle moves n narrow
    # pre-expansion rows, not n×k scored rows).
    scored = (
        emb.repartition(F.col("vec_id"))
        .crossJoin(F.broadcast(seeds))
        .select("vec_id", "v", "cid", cosine_expr(F.col("v"), F.col("cv")).alias("cs"))
    )
    by_vec = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cid"))
    # Per-vector norms are hoisted out of the pair stage: cos(a,b) =
    # dot/(na*nb) evaluates the identical expressions (bit-equal to
    # cosine_expr), but each norm is computed once per VECTOR instead
    # of twice per PAIR — the pair stage is the n^2/k term, so this
    # cuts its per-row arithmetic to one dot product from three folds.
    assigned = (
        scored.withColumn("rn", F.row_number().over(by_vec))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "v", norm_expr(F.col("v")).alias("nv"))
    )
    # Pair generation via per-cluster member lists + double explode
    # rather than a self-join: a self-join re-executes the whole
    # scan→score→argmax assignment subtree on BOTH sides (Spark can't
    # reuse the exchange across the differently-aliased branches), so
    # the n×k scoring — the most expensive stage — would run twice.
    # One groupBy(cluster) shuffles each vector once; a member-list row
    # is ~|c|·(dim·8)B ≈ 73 KB at the √n sizing here (and bounded by
    # the fixed cluster size on the extreme-scale IVF path), nowhere
    # near executor limits.
    members = assigned.groupBy(F.col("cid").alias("cluster")).agg(
        F.collect_list(F.struct("vec_id", "v", "nv")).alias("ms")
    )
    dot = dot_expr(F.col("a.v"), F.col("b.v"))
    # the id-order predicate applies INSIDE the array before the second
    # explode, so only the upper triangle is ever generated
    upper = F.filter("ms", lambda m: m["vec_id"] > F.col("a.vec_id"))
    pairs = (
        members.select("cluster", F.explode("ms").alias("a"), "ms")
        .select("cluster", "a", F.explode(upper).alias("b"))
        .select(
            "cluster",
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (dot / (F.col("a.nv") * F.col("b.nv"))).alias("cos_ab"),
        )
        .filter(F.col("cos_ab") >= SEM_TAU)
    )
    by_pruned = Window.partitionBy("id_b").orderBy(F.desc("cos_ab"), F.asc("id_a"))
    return (
        pairs.withColumn("rn", F.row_number().over(by_pruned))
        .filter(F.col("rn") == 1)
        .select(
            "cluster",
            F.col("id_b").alias("pruned_vec_id"),
            F.col("id_a").alias("keep_vec_id"),
            F.round("cos_ab", 6).alias("cos_sim"),
        )
    )
