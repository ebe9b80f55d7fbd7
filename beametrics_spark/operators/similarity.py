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
def ann_cosine_topk_bruteforce(
    spark: SparkSession, sf_dir: str, *, allow_quadratic: bool = False
) -> DataFrame:
    """Exact top-10 cosine neighbors for each query vector.

    Queries broadcast (tiny) → corpus scanned once, no shuffle of the
    corpus; per-query top-k via window row_number. Both engines compute
    in float64, ties broken by vec_id. Guarded on the QUERY side: cost is
    O(Q×N) and the plan broadcasts Q — a query TABLE must go through the
    LSH/IVF paths instead.
    """
    from beametrics_spark.functions import guard_quadratic

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    queries = guard_quadratic(
        queries,
        "query set",
        scale_path="ann_cosine_topk_lsh / ann_cosine_topk_ivf",
        limit=10_000,
        allow_quadratic=allow_quadratic,
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
#
# Config chosen by empirical sweep at sf0.01 (scripts/ann_sweep.py —
# recall vs fraction of the corpus scored, vs the brute-force truth):
#   16×4-bit bands, no probe   → recall 0.92 @ 0.63 scan   (lift 1.5×)
#   16×4-bit bands, ≤1 probe   → recall 1.00 @ 1.00 scan   (lift 1.0×)
#    8×8-bit bands, ≤1 probe   → recall 0.76 @ 0.27 scan   (lift 2.8×) ← chosen
#    8×8-bit bands, ≤2 probe   → recall 0.96 @ 0.73 scan   (lift 1.3×)
#    4×16-bit bands, ≤2 probe  → recall 0.10 @ 0.02 scan
# The test corpus is NEAR-UNIFORM — the adversarial case for LSH (true
# neighbors barely beat random, so recall can't far exceed scan
# fraction). The chosen point maximizes lift = recall/scan; on real
# clustered embeddings the same config's recall rises sharply while the
# scan fraction falls. Wider bands are more selective; query-side
# multi-probe buys recall back without touching corpus-side row count.


N_PLANES = 64  # signature bits (one long)
BAND_BITS = 8
N_BANDS = 8  # 8 bands × 8 bits; candidates agree on ≥1 (probed) band


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    Derived from xxhash64 of the (plane, dim) pair — reproducible across
    runs/executors with no RNG or driver-side state to broadcast.
    """
    h = F.xxhash64(F.lit(f"plane{plane}:dim{dim}"))
    return F.pmod(h, F.lit(2000001)).cast("double") / 1000000.0 - F.lit(1.0)


def _plane_table(spark: SparkSession, dims: int, planes: int) -> DataFrame:
    """(plane, dim, w) hyperplane components as a broadcastable table.

    Same values as `_plane_component` (xxhash64 of the same strings),
    built by a tiny Spark job instead of a literal expression tree: a
    planes×dims multiply-add tree (4096 terms at 64×64) spends minutes
    in whole-stage-codegen *compilation* — measured 129 s vs 45 s end to
    end for the 64-plane signature. Columnar join+agg keeps codegen flat.
    """
    grid = spark.createDataFrame(
        [(p, d) for p in range(planes) for d in range(dims)], "plane int, dim int"
    )
    h = F.xxhash64(F.format_string("plane%d:dim%d", F.col("plane"), F.col("dim")))
    return grid.withColumn(
        "w", F.pmod(h, F.lit(2000001)).cast("double") / 1000000.0 - F.lit(1.0)
    )


def with_signatures(
    spark: SparkSession,
    df: DataFrame,
    dims: int,
    planes: int = N_PLANES,
    vec_col: str = "v",
) -> DataFrame:
    """Append a `sig` long column: bit p = sign(vec · plane_p).

    Columnar: posexplode the vector, broadcast-join the plane table,
    hash-aggregate the dots, then OR the sign bits per vector. Two
    narrow shuffles on vec_id — a one-time cost per corpus (signatures
    are computed once and persisted alongside the vectors at scale).
    """
    exploded = df.select("vec_id", F.posexplode(vec_col).alias("dim", "val"))
    dots = (
        exploded.join(F.broadcast(_plane_table(spark, dims, planes)), "dim")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("val") * F.col("w")).alias("dot"))
    )
    # SQL shiftleft: the DataFrame function only takes a literal bit count
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), plane)")
    sigs = dots.groupBy("vec_id").agg(
        F.sum(F.when(F.col("dot") >= 0, bit).otherwise(F.lit(0).cast("long"))).alias(
            "sig"
        )
    )
    return df.join(sigs, "vec_id")


def banded_buckets(sigs: DataFrame) -> DataFrame:
    """Explode a `sig` column into (band, bucket) pairs — N_BANDS rows/vector."""
    mask = (1 << BAND_BITS) - 1
    return sigs.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), b * BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "v", "bb.band", "bb.bucket")


@register("ann_cosine_topk_lsh", None)
def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: hyperplane-LSH banding prunes the corpus, exact cosine
    re-ranks candidates. Rows-only (approximate recall by design).

    At 100 TB the corpus never all-pairs-joins: each vector lands in
    N_BANDS buckets; only bucket-mates of a probed query bucket are
    scored (measured 0.76 recall scoring 0.27 of the corpus at sf0.01).
    8-bit bands give ≥256 buckets/band of spread; AQE's skew join
    handles residual hot buckets.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = 64  # embeddings are 64-dim (TESTDATA)
    banded = banded_buckets(with_signatures(spark, emb, dims))
    # Multi-probe on the QUERY side only: each band probes its own bucket
    # plus every 1-bit-flip neighbor (8-bit band ⇒ 9 probes). A sign bit
    # near the hyperplane flips easily, so Hamming-1 buckets hold most of
    # the missed neighbors; probing from the tiny broadcast side leaves
    # the corpus at N_BANDS rows per vector — no scale cost.
    queries = (
        banded.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            "band",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(BAND_BITS)
                    ],
                )
            ).alias("bucket"),
        )
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
