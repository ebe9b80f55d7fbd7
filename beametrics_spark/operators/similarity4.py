"""Embedding operators, wave 4 (round 5): cluster geometry and the
first principal component.

- Centroid separation matrix: pairwise cosine between the per-label
  centroids — the cluster-geometry diagnostic read before trusting a
  label space (two labels at cosine 0.98 are one cluster wearing two
  names; ANN routing and stratified sampling both degrade on them).
- PCA power iteration: the corpus's first principal component via
  three power iterations on the covariance matrix — the spectral
  health check (a dominant eigenvalue ≫ the rest means the encoder
  collapsed onto a line; loadings locate the culprit dimensions) and
  the whitening/compression primitive. This is the repo's third
  iterative algorithm (after connected components and PageRank), and
  the first doing distributed linear algebra as join+aggregate.

The reference has no vector operations (SURVEY.md §2.2); extends
similarity.py/2/3 and ivf.py.

Scale notes (100 TB):
- centroids are k×dim (KB) — everything after the one corpus aggregate
  is broadcast-sized.
- covariance: the (i,j) moment aggregate fans each vector ×dim² via a
  self-join on vec_id, but partial aggregation collapses it to ≤4096
  partial sums per partition before the shuffle; the 64×64 result is
  then broadcast through every power iteration, so the corpus is
  scanned once total. dim=64 here; at dim ≥ ~1k, move the per-vector
  outer product into a mapInPandas numpy accumulation (same one-scan
  shape, BLAS inner loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import cosine_expr
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

PCA_ITERS = 3


_SEPARATION_ORACLE = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
  SELECT label, unnest(v) AS x, unnest(generate_series(1, len(v))) AS dim
  FROM e
),
cd AS (SELECT label, dim, avg(x) AS c FROM ex GROUP BY 1, 2),
cent AS (SELECT label, list(c ORDER BY dim) AS cv FROM cd GROUP BY 1)
SELECT a.label AS label_a, b.label AS label_b,
       ROUND(list_cosine_similarity(a.cv, b.cv), 6) AS cos_sim
FROM cent a JOIN cent b ON a.label < b.label
"""


@register("centroid_separation_matrix", _SEPARATION_ORACLE)
def centroid_separation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label centroids (all label pairs,
    a < b). One corpus aggregate produces the k×dim centroid table;
    the k×k comparison is a broadcast self-join over k rows — at any
    corpus size the quadratic part touches only centroids, never
    vectors."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        emb.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
    )
    a = cent.select(F.col("label").alias("label_a"), F.col("cv").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("cv").alias("cb"))
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(cosine_expr(F.col("ca"), F.col("cb")), 6).alias("cos_sim"),
        )
    )


def _pca_iterations_sql(iters: int) -> str:
    """Unrolled power-iteration CTEs (v1..v{iters}), mirroring the Spark
    loop step-for-step: w = M·v; v' = w / ||w||."""
    parts = []
    prev = "v0"
    for k in range(1, iters + 1):
        parts.append(
            f"""
w{k} AS (
  SELECT m.i AS dim, sum(m.val * {prev}.v) AS x
  FROM m JOIN {prev} ON m.j = {prev}.dim GROUP BY 1
),
n{k} AS (SELECT sqrt(sum(x * x)) AS s FROM w{k}),
v{k} AS (SELECT dim, x / n{k}.s AS v FROM w{k}, n{k})"""
        )
        prev = f"v{k}"
    return ",".join(parts)


_PCA_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
  SELECT vec_id, unnest(v) AS x, unnest(generate_series(1, len(v))) AS dim
  FROM e
),
mu AS (SELECT dim, avg(x) AS m FROM ex GROUP BY 1),
c AS (
  SELECT ex.vec_id, ex.dim, ex.x - mu.m AS x
  FROM ex JOIN mu USING (dim)
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM e),
m AS (
  SELECT a.dim AS i, b.dim AS j, sum(a.x * b.x) / any_value(n.n_vecs) AS val
  FROM c a JOIN c b ON a.vec_id = b.vec_id, n
  GROUP BY 1, 2
),
dims AS (SELECT DISTINCT dim FROM ex),
v0 AS (SELECT dim, 1.0 / sqrt((SELECT count(*) FROM dims)) AS v FROM dims),
{_pca_iterations_sql(PCA_ITERS)},
ray AS (
  SELECT sum(vp.v * w.x) AS lambda FROM v{PCA_ITERS} vp JOIN (
    SELECT m.i AS dim, sum(m.val * v{PCA_ITERS}.v) AS x
    FROM m JOIN v{PCA_ITERS} ON m.j = v{PCA_ITERS}.dim GROUP BY 1
  ) w USING (dim)
),
signfix AS (SELECT CASE WHEN sum(v) < 0 THEN -1.0 ELSE 1.0 END AS s
            FROM v{PCA_ITERS})
SELECT vp.dim, ROUND(vp.v * signfix.s, 6) AS loading,
       ROUND(ray.lambda, 6) AS eigenvalue
FROM v{PCA_ITERS} vp, ray, signfix
"""


@register("embedding_pca_power_iteration", _PCA_ORACLE)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal component of the embedding corpus: per-dimension
    loadings of the covariance matrix's top eigenvector after
    {K} power iterations from the uniform start vector, plus the
    Rayleigh-quotient eigenvalue (the variance along the component).
    Sign convention: the loading sum is made non-negative (power
    iteration determines the direction only up to sign).

    Spark-first linear algebra: the corpus is touched ONCE — the
    centered (i,j) second-moment aggregate (self-join on vec_id fans
    ×dim² but map-side partials collapse to ≤dim² sums per partition
    before the shuffle) — and every subsequent mat-vec multiplies the
    broadcast 64×64 matrix against a 64-row vector (join + hash
    aggregate, the same shape as PageRank's step). The DuckDB oracle
    unrolls the identical {K} iterations as CTEs, so convergence
    behavior is value-checked, not assumed. Rounding to 6 dp absorbs
    summation-order noise (diluted further by each normalization)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = emb.select("vec_id", F.posexplode("v").alias("dim", "x"))
    mu = ex.groupBy("dim").agg(F.avg("x").alias("m"))
    centered = (
        ex.join(F.broadcast(mu), "dim")
        .select("vec_id", "dim", (F.col("x") - F.col("m")).alias("x"))
    )
    n_vecs = emb.count()  # one scalar; the corpus count is job metadata
    a = centered.select("vec_id", F.col("dim").alias("i"), F.col("x").alias("xa"))
    b = centered.select("vec_id", F.col("dim").alias("j"), F.col("x").alias("xb"))
    m = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg((F.sum(F.col("xa") * F.col("xb")) / F.lit(n_vecs)).alias("val"))
        .localCheckpoint(eager=True)  # 64×64: reused by every iteration
    )
    dim_count = 64
    v = m.select(F.col("i").alias("dim")).distinct().select(
        "dim", (F.lit(1.0) / F.lit(float(dim_count) ** 0.5)).alias("v")
    )
    for _ in range(PCA_ITERS):
        w = (
            m.join(F.broadcast(v), m["j"] == v["dim"])
            .groupBy("i")
            .agg(F.sum(F.col("val") * F.col("v")).alias("x"))
        )
        norm = w.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("s"))
        v = w.crossJoin(F.broadcast(norm)).select(
            F.col("i").alias("dim"), (F.col("x") / F.col("s")).alias("v")
        )
    w_final = (
        m.join(F.broadcast(v), m["j"] == v["dim"])
        .groupBy("i")
        .agg(F.sum(F.col("val") * F.col("v")).alias("x"))
    )
    ray = (
        v.join(w_final, v["dim"] == w_final["i"])
        .agg(F.sum(F.col("v") * F.col("x")).alias("lam"))
    )
    signfix = v.agg(
        F.when(F.sum("v") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("s")
    )
    return (
        v.crossJoin(F.broadcast(ray))
        .crossJoin(F.broadcast(signfix))
        .select(
            # +1: DuckDB's generate_series dims are 1-based BIGINT
            (F.col("dim") + 1).cast("long").alias("dim"),
            F.round(F.col("v") * F.col("s"), 6).alias("loading"),
            F.round("lam", 6).alias("eigenvalue"),
        )
    )


embedding_pca_power_iteration.__doc__ = (
    embedding_pca_power_iteration.__doc__.replace("{K}", str(PCA_ITERS))
)


# ---------------------------------------------------------------------------
# kNN label-vote audit (round 7): leave-one-out classification accuracy
# ---------------------------------------------------------------------------

VOTE_K = 5  # neighbors per vector; odd-ish but ties are still possible


_VOTE_ORACLE = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
scored AS (
  SELECT a.vec_id AS src, a.label AS true_label, b.label AS nb_label,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                                     b.vec_id ASC) AS rk
  FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id
),
votes AS (
  SELECT src, true_label, nb_label, count(*) AS nv
  FROM scored WHERE rk <= {VOTE_K}
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT src, true_label, nb_label AS pred_label
  FROM (SELECT *, row_number() OVER (PARTITION BY src
                                     ORDER BY nv DESC, nb_label ASC) AS pr
        FROM votes)
  WHERE pr = 1
)
SELECT true_label AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
             * CAST(1 AS DOUBLE) / count(*), 4) AS accuracy
FROM pred GROUP BY 1
"""


@register("knn_label_vote_audit", _VOTE_ORACLE)
def knn_label_vote_audit(
    spark: SparkSession, sf_dir: str, *, allow_quadratic: bool = False
) -> DataFrame:
    """Leave-one-out k-NN label agreement per class — the standard
    embedding-quality eval: if a vector's {VOTE_K} nearest neighbors
    (cosine) majority-vote its own label, the label space is locally
    coherent; per-class accuracy pinpoints WHICH labels bleed into each
    other (complementing centroid_separation_matrix, which sees only
    class centers — two classes can have distant centroids yet
    interleave at the boundary, and only the vote audit catches that).

    Determinism contract: neighbors rank on the 6-dp ROUNDED cosine
    with vec_id tiebreak (the knn_graph_hub_stats convention), votes
    are integers, and vote ties break toward the smaller label — every
    decision is integer-ordered, so both engines pick identical
    predictions.

    Exact neighbors are O(n²), so the input is guarded
    (guard_quadratic): run it on a bounded eval sample. At corpus
    scale, feed IVF-probe or LSH candidate edges through the identical
    vote + accuracy rollup — only the edge generator changes, exactly
    the knn_hub_stats_over pattern (similarity3.py).
    """
    from beametrics_spark.functions import guard_quadratic

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    emb = guard_quadratic(
        emb,
        "kNN label-vote corpus",
        scale_path="vote rollup over LSH/IVF candidate edges",
        limit=10_000,
        allow_quadratic=allow_quadratic,
    )
    left = emb.select(
        F.col("vec_id").alias("src"),
        F.col("label").alias("true_label"),
        F.col("v").alias("sv"),
    )
    right = emb.select(
        F.col("vec_id").alias("dst"),
        F.col("label").alias("nb_label"),
        F.col("v").alias("dv"),
    )
    scored = left.join(
        F.broadcast(right), F.col("src") != F.col("dst")
    ).withColumn("sim", F.round(cosine_expr(F.col("sv"), F.col("dv")), 6))

    wk = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    votes = (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= VOTE_K)
        .groupBy("src", "true_label", "nb_label")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    wv = Window.partitionBy("src").orderBy(F.desc("nv"), F.asc("nb_label"))
    pred = (
        votes.withColumn("pr", F.row_number().over(wv))
        .filter(F.col("pr") == 1)
        .select("src", "true_label", F.col("nb_label").alias("pred_label"))
    )
    correct = (F.col("pred_label") == F.col("true_label")).cast("long")
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(correct).alias("n_correct"),
        F.round(F.sum(correct) / F.count(F.lit(1)), 4).alias("accuracy"),
    )


knn_label_vote_audit.__doc__ = knn_label_vote_audit.__doc__.replace(
    "{VOTE_K}", str(VOTE_K)
)


# ---------------------------------------------------------------------------
# Truncation fidelity (round 7): Matryoshka-style prefix-energy audit
# ---------------------------------------------------------------------------

TRUNC_DIM = 16  # prefix length audited against the full EMB_DIM=64


_TRUNC_ORACLE = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
en AS (
  SELECT label,
         list_sum(list_transform(v[1:{TRUNC_DIM}], x -> x * x))
           / list_sum(list_transform(v, x -> x * x)) AS frac
  FROM e
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(avg(frac), 4) AS avg_energy_frac,
       round(min(frac), 6) AS min_energy_frac,
       CAST(sum(CASE WHEN frac * 2 >= 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_majority_prefix
FROM en GROUP BY label
"""


@register("embedding_truncation_fidelity", _TRUNC_ORACLE)
def embedding_truncation_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label audit of how much vector ENERGY the first {TRUNC_DIM}
    of the 64 dimensions carry — the go/no-go check before serving
    truncated (Matryoshka-style) embeddings: cosine under truncation
    degrades with the energy the cut discards, so a label whose
    min_energy_frac is low will mis-rank under a truncated index even
    if the average looks fine. n_majority_prefix counts vectors whose
    prefix holds ≥ half the energy (an integer cross-multiplied
    threshold — frac·2 ≥ 1 — so the count is float-compare-safe).

    Plan: one in-row array fold per vector (zero shuffle) + one hash
    aggregate — scan-bound at any scale. The per-row fraction is a
    ratio of two same-order IEEE sum chains, identical in both engines;
    the avg is the usual parallel double reduction, guarded by round(4)
    and the partition-invariance gate.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    sq = lambda acc, x: acc + x * x  # noqa: E731
    frac = F.aggregate(
        F.slice("v", 1, TRUNC_DIM), F.lit(0.0), sq
    ) / F.aggregate("v", F.lit(0.0), sq)
    en = emb.select("label", frac.alias("frac"))
    return en.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("frac"), 4).alias("avg_energy_frac"),
        F.round(F.min("frac"), 6).alias("min_energy_frac"),
        F.sum((F.col("frac") * 2 >= 1).cast("long")).alias(
            "n_majority_prefix"
        ),
    )


embedding_truncation_fidelity.__doc__ = embedding_truncation_fidelity.__doc__.replace(
    "{TRUNC_DIM}", str(TRUNC_DIM)
)
