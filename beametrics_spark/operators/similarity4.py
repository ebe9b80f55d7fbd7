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

from pyspark.sql import DataFrame, SparkSession
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
