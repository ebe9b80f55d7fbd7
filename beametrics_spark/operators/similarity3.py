"""Embedding operators, wave 3: corpus-health diagnostics for a vector
pipeline — per-dimension distribution statistics (the calibration input
for whitening and per-dimension quantization), norm-outlier detection
(broken encoders emit near-zero or exploding vectors), and kNN-graph
hub statistics (high in-degree "hub" vectors degrade ANN recall and are
the standard diagnostic for hubness in high dimensions).

The reference has no vector operations at all (SURVEY.md §2.2); these
extend similarity.py / similarity2.py / ivf.py.

Scale notes (100 TB):
- dim stats: posexplode fans rows ×dim but partial aggregation collapses
  to dim×|partitions| partials pre-shuffle; the result is dim rows.
- norm outliers: the norm is row-local (in-row array fold, zero
  shuffle); the corpus mean/std is ONE broadcastable aggregate row, and
  the flagging pass pipelines with the scan — same two-scan
  broadcast-cutoff shape as doc_length_outlier_flags.
- hub stats: the exact kNN graph is quadratic by construction, so the
  operator is guarded (diagnostic over a bounded corpus or sample); at
  full scale you compute the same in-degree rollup over LSH/IVF
  candidate edges (similarity.py / ivf.py) instead of exact edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.functions import guard_quadratic
from beametrics_spark.operators.dedup import cosine_expr
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

GRAPH_K = 5  # neighbors per vector in the kNN graph
NORM_Z_THRESH = 2.0  # |z| beyond which a vector's norm is an outlier


_DIM_STATS_ORACLE = """
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
  SELECT unnest(v) AS x, unnest(generate_series(1, len(v))) AS dim FROM e
)
SELECT dim,
       round(avg(x), 6) AS mean_x,
       round(stddev_samp(x), 6) AS std_x,
       round(min(x), 6) AS min_x,
       round(max(x), 6) AS max_x
FROM ex GROUP BY 1
"""


@register("embedding_dim_stats", _DIM_STATS_ORACLE)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std/min/max over the corpus — the calibration
    table for whitening (subtract mean, divide std) and per-dimension
    int8 quantization ranges.  posexplode → one hash aggregate keyed by
    dim; map-side partials shrink the ×64 fan-out to 64 rows per
    partition before the (tiny) shuffle."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    return (
        emb.select(F.posexplode("v").alias("pos", "x"))
        # dim as long: match DuckDB generate_series BIGINT output width
        .groupBy((F.col("pos") + 1).cast("long").alias("dim"))
        .agg(
            F.round(F.avg("x"), 6).alias("mean_x"),
            F.round(F.stddev_samp("x"), 6).alias("std_x"),
            F.round(F.min("x"), 6).alias("min_x"),
            F.round(F.max("x"), 6).alias("max_x"),
        )
    )


_NORM_OUTLIERS_ORACLE = f"""
WITH n AS (
  SELECT vec_id,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x * x))) AS norm
  FROM embeddings
),
s AS (SELECT avg(norm) AS mu, stddev_samp(norm) AS sd FROM n)
SELECT vec_id, round(norm, 6) AS norm,
       round((norm - s.mu) / s.sd, 4) AS z
FROM n, s
WHERE abs(round((norm - s.mu) / s.sd, 4)) > {NORM_Z_THRESH}
"""


@register("embedding_norm_outliers", _NORM_OUTLIERS_ORACLE)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors whose L2 norm is > {Z}σ from the corpus mean — the cheap
    encoder-health check (all-zero, truncated, or exploding embeddings
    show up here before they poison ANN recall).

    The norm is an in-row array fold (zero shuffle); mean/std is one
    broadcast aggregate row; the filter compares the ROUNDED z in both
    engines so fp sum-order noise can never flip boundary membership.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    norms = emb.select(
        "vec_id",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("norm"),
    )
    stats = norms.agg(
        F.avg("norm").alias("mu"), F.stddev_samp("norm").alias("sd")
    )
    z = F.round((F.col("norm") - F.col("mu")) / F.col("sd"), 4)
    return (
        norms.crossJoin(F.broadcast(stats))
        .filter(F.abs(z) > NORM_Z_THRESH)
        .select("vec_id", F.round("norm", 6).alias("norm"), z.alias("z"))
    )


_HUB_STATS_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                                     b.vec_id ASC) AS rk
  FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id
),
edges AS (SELECT src, dst FROM scored WHERE rk <= {GRAPH_K}),
deg AS (
  SELECT e.vec_id, count(edges.src) AS in_degree
  FROM e LEFT JOIN edges ON edges.dst = e.vec_id
  GROUP BY 1
)
SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors
FROM deg GROUP BY 1
"""


@register("knn_graph_hub_stats", _HUB_STATS_ORACLE)
def knn_graph_hub_stats(
    spark: SparkSession, sf_dir: str, *, allow_quadratic: bool = False
) -> DataFrame:
    """In-degree histogram of the exact kNN graph (k={K}): how many
    vectors appear in 0, 1, 2, … other vectors' neighbor lists.  A
    heavy right tail = hubness — the high-dimensional pathology that
    concentrates ANN traffic on a few vectors and silently caps recall.

    Exact edges are O(n²), so the input is guarded (guard_quadratic):
    this is a diagnostic you run on a bounded sample.  At corpus scale
    the identical rollup runs over LSH/IVF candidate edges instead via
    knn_hub_stats_over(edges, universe) below — only the edge generator
    changes (exercised end-to-end over LSH candidates in
    tests/test_similarity3.py::test_hub_stats_over_lsh_edges).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    emb = guard_quadratic(
        emb,
        "kNN-graph corpus",
        scale_path="in-degree rollup over LSH/IVF candidate edges",
        limit=10_000,
        allow_quadratic=allow_quadratic,
    )
    left = emb.select(F.col("vec_id").alias("src"), F.col("v").alias("sv"))
    right = emb.select(F.col("vec_id").alias("dst"), F.col("v").alias("dv"))
    # Rank on the 6-dp ROUNDED similarity in both engines (the repo's
    # determinism contract for similarity ranking — see
    # embedding_centroid_assign): unrounded doubles differ per engine by
    # summation order, and a last-ulp difference on near-tied neighbors
    # would flip edges and change the oracle-checked histogram.
    scored = (
        left.join(F.broadcast(right), F.col("src") != F.col("dst"))
        .withColumn("sim", F.round(cosine_expr(F.col("sv"), F.col("dv")), 6))
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    edges = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GRAPH_K)
        .select("src", "dst")
    )
    return knn_hub_stats_over(edges, emb)


def knn_hub_stats_over(edges: DataFrame, universe: DataFrame) -> DataFrame:
    """The hub-stats rollup over an ARBITRARY (src, dst) edge table —
    the executable 100 TB path: feed it candidate edges from the LSH
    bucket join (similarity.banded_buckets) or the IVF probe
    (ivf.assign_cells) instead of exact O(n²) edges, and the identical
    groupBy-dst + left-join-for-the-zero-bucket aggregation runs at
    corpus scale (tests/test_similarity3.py::test_hub_stats_over_lsh_edges
    wires the LSH candidate generator through this rollup).

    ``universe`` supplies the vec_id population so vectors with zero
    in-degree appear in the histogram (a pure groupBy over edges would
    silently drop them)."""
    deg = (
        universe.select("vec_id")
        .join(edges, edges["dst"] == F.col("vec_id"), "left")
        .groupBy("vec_id")
        .agg(F.count("src").alias("in_degree"))
    )
    return deg.groupBy("in_degree").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


knn_graph_hub_stats.__doc__ = knn_graph_hub_stats.__doc__.replace(
    "{K}", str(GRAPH_K)
)
embedding_norm_outliers.__doc__ = embedding_norm_outliers.__doc__.replace(
    "{Z}", str(NORM_Z_THRESH)
)


_QERR_ORACLE = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m AS (
  SELECT vec_id, label, v,
         list_max(list_transform(v, x -> abs(x))) AS s
  FROM e
),
err AS (
  SELECT vec_id, label,
         list_sum(list_transform(
           v, x -> pow(x - round(127 * x / s) * s / 127, 2))) / len(v) AS mse,
         list_max(list_transform(
           v, x -> abs(x - round(127 * x / s) * s / 127))) AS maxerr,
         s
  FROM m WHERE s > 0
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(mse), 8) AS avg_mse,
       round(max(maxerr), 6) AS max_abs_err,
       round(avg(s / 254), 6) AS avg_err_bound
FROM err GROUP BY 1
"""


@register("embedding_quantization_error", _QERR_ORACLE)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction-error audit for the int8 quantizer (similarity2):
    dequantize q·scale/127 in place, per-vector MSE and max component
    error, rolled up per label against the theoretical half-step bound
    (scale/254).  This is the acceptance test a pipeline runs before
    swapping an ANN index to quantized storage — if avg_mse approaches
    the bound², the quantizer is behaving; above it, something (scale
    overflow, rounding mismatch) broke.

    All error terms are in-row array folds over identical doubles in
    both engines (sequential fold order — deterministic); only the
    per-label averages cross partitions, absorbed by round(8)/round(6).
    Zero-scale vectors are excluded (they carry no error)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    s = F.array_max(F.transform("v", F.abs))
    m = emb.select("vec_id", "label", "v", s.alias("s")).filter(F.col("s") > 0)
    deq_err = lambda x: x - F.round(F.lit(127) * x / F.col("s")) * F.col("s") / 127  # noqa: E731
    mse = (
        F.aggregate(
            F.transform("v", lambda x: F.pow(deq_err(x), F.lit(2))),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
        / F.size("v")
    )
    maxerr = F.array_max(F.transform("v", lambda x: F.abs(deq_err(x))))
    err = m.select(
        "label", mse.alias("mse"), maxerr.alias("maxerr"), F.col("s")
    )
    return err.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("mse"), 8).alias("avg_mse"),
        F.round(F.max("maxerr"), 6).alias("max_abs_err"),
        F.round(F.avg(F.col("s") / 254), 6).alias("avg_err_bound"),
    )


_WHITEN_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
  SELECT unnest(v) AS x, unnest(generate_series(1, len(v))) AS dim FROM e
),
stats AS (
  SELECT dim, avg(x) AS mu, stddev_samp(x) AS sd FROM ex GROUP BY 1
),
vecs AS (
  SELECT list(mu ORDER BY dim) AS mus, list(sd ORDER BY dim) AS sds
  FROM stats
)
SELECT e.vec_id,
       round(sqrt(list_sum(list_transform(
         generate_series(1, len(e.v)),
         i -> pow((e.v[i] - vecs.mus[i]) / vecs.sds[i], 2)))), 6)
         AS whitened_norm
FROM e, vecs
"""


@register("embedding_whitened_norms", _WHITEN_ORACLE)
def embedding_whitened_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the whitening transform (subtract per-dimension mean,
    divide per-dimension std — the calibration embedding_dim_stats
    computes) and report each vector's whitened L2 norm.  For healthy
    data this concentrates around sqrt(dim); vectors far above it are
    multivariate outliers that per-dimension min/max clipping misses.

    The per-dim stats aggregate once (dim-keyed partials), collapse to
    two 64-element arrays via a sorted collect, broadcast, and the
    transform + norm run as in-row zip folds — no second wide shuffle.
    The stats' last-ulp cross-engine noise is diluted by the 64-term
    sum and absorbed by round(6)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    stats = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy(F.col("pos").alias("dim"))
        .agg(F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd"))
    )
    vecs = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s["mu"]
        ).alias("mus"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "sd"))), lambda s: s["sd"]
        ).alias("sds"),
    )
    wn = F.sqrt(
        F.aggregate(
            F.zip_with(
                "v",
                F.zip_with("mus", "sds", lambda m, s: F.struct(m.alias("m"), s.alias("s"))),
                lambda x, ms: F.pow((x - ms["m"]) / ms["s"], F.lit(2)),
            ),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
    )
    return emb.crossJoin(F.broadcast(vecs)).select(
        "vec_id", F.round(wn, 6).alias("whitened_norm")
    )
