"""Embedding operators, wave 2: the vector-pipeline building blocks that
sit AROUND similarity search — centroid computation (the k-means /
IVF-training E-step), nearest-centroid assignment (one clustering
iteration), and per-vector symmetric int8 quantization (the storage/
bandwidth lever for 100 TB embedding corpora).

The reference has no vector operations at all (SURVEY.md §2.2); these
extend the engine's embedding surface beyond the ANN queries in
similarity.py / ivf.py.

Scale notes (100 TB stance):
- Centroids: posexplode multiplies rows ×dim, but the exploded rows are
  (label, dim, x) — 3 narrow columns — and partial aggregation collapses
  them to |labels|×dim per partition BEFORE the shuffle. The global
  result is tiny (k×dim), so downstream consumers broadcast it.
- Assignment: corpus × centroids is a broadcast nested-loop over k rows
  per vector — never a shuffle of the corpus; argmax via per-vector
  row_number on a k-row partition.
- Quantization is row-local (zero shuffle): each vector's scale is its
  own max-|x|, so the operator parallelizes perfectly and never needs a
  corpus statistics pass (per-dimension schemes would need one global
  aggregate, also broadcastable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import cosine_expr
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

DIM = 64


def _doubled(df: DataFrame) -> DataFrame:
    """embedding cast float→double once, so Spark and the oracle compute
    from bit-identical operands."""
    return df.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


_CENTROIDS_ORACLE = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
  SELECT label, unnest(v) AS x, unnest(generate_series(1, len(v))) AS dim
  FROM e
)
SELECT label, dim, round(avg(x), 6) AS centroid
FROM ex GROUP BY 1, 2
"""


@register("embedding_centroids_per_label", _CENTROIDS_ORACLE)
def embedding_centroids_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label per-dimension mean vector — the aggregation at the heart
    of k-means, IVF coarse-quantizer training, and class prototypes.
    posexplode → hash aggregate; map-side partial combine reduces the
    ×64 row fan-out to |labels|×64 partial sums per partition before the
    (tiny) shuffle."""
    emb = _doubled(load_table(spark, sf_dir, "embeddings"))
    return (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        # dim as long: DuckDB's generate_series unnest is BIGINT — keep the
        # engines' output widths identical for the driver's schema compare
        .groupBy("label", (F.col("pos") + 1).cast("long").alias("dim"))
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
    )


_ASSIGN_ORACLE = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
  SELECT label, unnest(v) AS x, unnest(generate_series(1, len(v))) AS dim
  FROM e
),
cd AS (SELECT label, dim, avg(x) AS c FROM ex GROUP BY 1, 2),
cent AS (SELECT label AS c_label, list(c ORDER BY dim) AS cv FROM cd GROUP BY 1),
scored AS (
  SELECT e.vec_id, e.label, cent.c_label,
         ROUND(list_cosine_similarity(e.v, cent.cv), 6) AS sim,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY ROUND(list_cosine_similarity(e.v, cent.cv), 6) DESC,
                                     cent.c_label ASC) AS rk
  FROM e CROSS JOIN cent
)
SELECT vec_id, label, c_label AS assigned_label, sim AS cos_sim
FROM scored WHERE rk = 1
"""


@register("embedding_centroid_assign", _ASSIGN_ORACLE)
def embedding_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment: one full k-means iteration (E-step
    over the M-step's output) — also exactly the IVF list-assignment
    step. Centroids are k×dim — computed once, broadcast; each vector
    scores k candidates in place (no corpus shuffle) and keeps the
    argmax via row_number over the k-row group, label ascending on
    ties."""
    emb = _doubled(load_table(spark, sf_dir, "embeddings"))
    cent = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy(F.col("label").alias("c_label"), F.col("pos").alias("dim"))
        .agg(F.avg("x").alias("c"))
        .groupBy("c_label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
    )
    # Rank on the 6-dp ROUNDED similarity (same quantization as the output)
    # so both engines order near-equidistant centroids identically — the
    # unrounded doubles differ per engine by summation order, and a
    # within-a-ulp pair could otherwise flip assigned_label between runs.
    scored = emb.join(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "c_label",
        F.round(cosine_expr(F.col("v"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("c_label"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            "label",
            F.col("c_label").alias("assigned_label"),
            F.col("sim").alias("cos_sim"),
        )
    )


_QUANTIZE_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM e
)
SELECT vec_id,
       round(maxabs, 6) AS scale,
       array_to_string(
         CASE WHEN maxabs = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(round(127 * x / maxabs) AS INT))
         END, ',') AS q
FROM m
"""


@register("embedding_quantize_int8", _QUANTIZE_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (faiss-SQ8-style): scale =
    max|x| of the vector, q_i = round(127·x_i/scale) ∈ [-127, 127] —
    a 4× storage/bandwidth cut for float32 corpora, which at 100 TB is
    the difference between an in-memory and a spilling ANN index.
    Row-local: zero shuffles, perfectly parallel, and the dequantized
    error bound (scale/254 per component) travels with the row as
    `scale`. Zero vectors quantize to zeros rather than NaN.

    The int8 vector is emitted as a comma-joined STRING (not ARRAY<INT>):
    the driver's pandas-based canonicalizer cannot hash list cells
    (r04 red row), and the CSV form is byte-identical across engines
    (Spark int→string cast ≡ DuckDB array_to_string) while staying
    row-local and losslessly parseable back with split(',')."""
    emb = _doubled(load_table(spark, sf_dir, "embeddings"))
    m = F.array_max(F.transform("v", F.abs))
    with_scale = emb.select("vec_id", "v", m.alias("maxabs"))
    q = F.when(
        F.col("maxabs") == 0.0,
        F.transform("v", lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            "v",
            lambda x: F.round(F.lit(127) * x / F.col("maxabs")).cast("int"),
        )
    )
    return with_scale.select(
        "vec_id",
        F.round("maxabs", 6).alias("scale"),
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q"),
    )
