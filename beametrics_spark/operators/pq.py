"""Product quantization (PQ) approximate nearest neighbor — the
memory-scale path for similarity search.

IVF (ivf.py) prunes WHICH vectors get scored; PQ compresses HOW each
vector is scored: the D-dim vector splits into M contiguous subspaces,
each subvector is replaced by the id of its nearest codeword from a
per-subspace K-entry codebook, and a query scores a vector by summing M
table lookups (ADC — asymmetric distance computation) instead of a
D-term dot product. At 100 TB this is the difference between scanning
64 float64s and scanning M small codes per vector (64x compression
here), with the codebooks (M*K*[D/M] floats — KB) broadcast everywhere.
Production systems compose both (IVF-PQ); the building blocks here are
written so pq codes can score ivf.probe_cells candidates directly.

Fully deterministic like ivf.py: seeds are the first K corpus vectors
under an xxhash64(vec_id) ordering (TakeOrderedAndProject — no global
sort, no RNG); all heavy steps are columnar joins + hash aggregations
against broadcast codebook tables. Codebooks train with Lloyd updates
under the L2 objective — argmin ||x-c||^2 == argmax (x.c - ||c||^2/2),
so assignment is the same broadcast-join + hash-agg shape as
ivf.assign_cells with a half-norm correction term.

Approximate by construction (quantization error) => rows-only registry
entry; tests/test_pq.py asserts recall vs the brute-force oracle,
determinism, and that codes actually compress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import cosine_expr
from beametrics_spark.operators.similarity import N_QUERIES, TOP_K
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

M_SUBSPACES = 8
K_CODEWORDS = 16
PQ_LLOYD_ITERS = 2
RERANK_CAND = 5 * TOP_K  # exact re-rank depth over the ADC ranking


def _sub_dims(df: DataFrame, width: int) -> DataFrame:
    """(vec_id, v) -> (vec_id, sub, dimpos, val): contiguous subspace
    split, computed from posexplode in codegen (no UDF)."""
    return df.select(
        "vec_id", F.posexplode("v").alias("dim", "val")
    ).select(
        "vec_id",
        (F.col("dim") / width).cast("int").alias("sub"),
        (F.col("dim") % width).alias("dimpos"),
        "val",
    )


def _codebook_df(spark: SparkSession, codebooks: dict[tuple[int, int], list[float]]):
    """Broadcastable (sub, code, dimpos, w) + (sub, code, half_sq) tables."""
    rows = [
        (sub, code, d, w)
        for (sub, code), vec in codebooks.items()
        for d, w in enumerate(vec)
    ]
    weights = spark.createDataFrame(rows, "sub int, code int, dimpos int, w double")
    norms = spark.createDataFrame(
        [
            (sub, code, sum(w * w for w in vec) / 2.0)
            for (sub, code), vec in codebooks.items()
        ],
        "sub int, code int, half_sq double",
    )
    return weights, norms


def assign_codes(
    spark: SparkSession,
    corpus: DataFrame,
    codebooks: dict[tuple[int, int], list[float]],
    width: int,
) -> DataFrame:
    """vec_id, sub -> nearest codeword id (L2), via broadcast join + hash
    agg + per-(vec,sub) argmin window. Ties break on the lowest code."""
    weights, norms = _codebook_df(spark, codebooks)
    dots = (
        _sub_dims(corpus, width)
        .join(F.broadcast(weights), ["sub", "dimpos"])
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum(F.col("val") * F.col("w")).alias("dot"))
    )
    scored = dots.join(F.broadcast(norms), ["sub", "code"]).withColumn(
        "obj", F.col("dot") - F.col("half_sq")
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.desc("obj"), F.asc("code"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )


def train_pq_codebooks(
    spark: SparkSession,
    corpus: DataFrame,
    *,
    m: int = M_SUBSPACES,
    k: int = K_CODEWORDS,
    iters: int = PQ_LLOYD_ITERS,
) -> tuple[dict[tuple[int, int], list[float]], int]:
    """Deterministic per-subspace k-means; returns ({(sub, code): vec},
    subspace width). Codebooks live on the driver (M*K*width floats —
    KB); assignment and mean updates are distributed."""
    dim = len(corpus.select("v").first()["v"])
    if m <= 0 or dim < m or dim % m != 0:
        raise ValueError(
            f"PQ needs the vector dimension divisible by the subspace "
            f"count: dim={dim}, m={m} — trailing dimensions would be "
            f"silently dropped from every encoding and score otherwise"
        )
    width = dim // m
    seeds = (
        corpus.orderBy(F.xxhash64("vec_id"), "vec_id").limit(k).select("v").collect()
    )
    codebooks: dict[tuple[int, int], list[float]] = {}
    for code, row in enumerate(seeds):
        v = list(row["v"])
        for sub in range(m):
            codebooks[(sub, code)] = v[sub * width : (sub + 1) * width]
    dims = None
    for _ in range(iters):
        assigned = assign_codes(spark, corpus, codebooks, width)
        if dims is None:
            dims = _sub_dims(corpus, width)
        means = (
            dims.join(assigned, ["vec_id", "sub"])
            .groupBy("sub", "code", "dimpos")
            .agg(F.avg("val").alias("mv"))
            .groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("dimpos", "mv"))).alias("ms"))
            .collect()
        )
        updated = {
            (r["sub"], r["code"]): [x["mv"] for x in r["ms"]] for r in means
        }
        codebooks = {
            key: updated.get(key, vec) for key, vec in codebooks.items()
        }
    return codebooks, width


def adc_query_table(
    spark: SparkSession,
    queries: DataFrame,
    codebooks: dict[tuple[int, int], list[float]],
    width: int,
) -> DataFrame:
    """(query_id, qv) -> the per-query ADC lookup table: dot(q_sub,
    codeword) for every (sub, code) — Q*M*K rows, computed with the same
    broadcast-join + hash-agg shape as encoding. KB-scale: broadcast it
    into whatever code scan consumes it (the full scan in
    ann_cosine_topk_pq, or an IVF-candidate slice for the IVF-PQ
    composition — tests/test_pq.py::test_pq_scores_ivf_candidates)."""
    weights, _ = _codebook_df(spark, codebooks)
    # the same subspace split as the corpus side — through the SAME
    # helper, so corpus and query sides can never disagree on subspace
    # assignment
    qsub = _sub_dims(
        queries.select(F.col("query_id").alias("vec_id"), F.col("qv").alias("v")),
        width,
    ).withColumnRenamed("vec_id", "query_id")
    return (
        qsub.join(F.broadcast(weights), ["sub", "dimpos"])
        .groupBy("query_id", "sub", "code")
        .agg(F.sum(F.col("val") * F.col("w")).alias("qdot"))
    )


@register("ann_cosine_topk_pq", None)
def ann_cosine_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC ANN top-k: encode the corpus as M={M} codes from
    K={K}-entry per-subspace codebooks, score every code row against
    each query's broadcast lookup table (Q*M*K dot products, computed
    distributed, KB-scale), take the top {R} per query by approximate
    score, then exact-rerank those candidates to the final top {T}.

    Output schema matches the brute-force/LSH/IVF family
    (query_id, vec_id, cos_sim, rk) with EXACT similarities after the
    re-rank — only the candidate CHOICE is approximate. Rows-only by
    design; tests/test_pq.py asserts recall >= 0.6 vs brute force,
    byte-for-byte determinism, and the compression factor."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    codebooks, width = train_pq_codebooks(spark, corpus)
    codes = assign_codes(spark, corpus, codebooks, width)
    qtable = adc_query_table(spark, queries, codebooks, width)

    # ADC scan: every corpus CODE row joins its M lookup entries; the
    # approximate score is the sum of M table values — no vector math
    # touches the corpus here, which is the entire point of PQ
    approx = (
        codes.join(F.broadcast(qtable), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qdot").alias("approx_score"))
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.desc("approx_score"), F.asc("vec_id")
    )
    cands = (
        approx.withColumn("crk", F.row_number().over(w_cand))
        .filter(F.col("crk") <= RERANK_CAND)
        .select("query_id", "vec_id")
    )

    # exact re-rank of the candidate slice only
    rerank = (
        cands.join(corpus, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn("sim", cosine_expr(F.col("qv"), F.col("v")))
    )
    w_final = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        rerank.withColumn("rk", F.row_number().over(w_final))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), "rk")
    )


ann_cosine_topk_pq.__doc__ = ann_cosine_topk_pq.__doc__.replace(
    "{M}", str(M_SUBSPACES)
).replace("{K}", str(K_CODEWORDS)).replace("{R}", str(RERANK_CAND)).replace(
    "{T}", str(TOP_K)
)


@register("ann_cosine_topk_ivfpq", None)
def ann_cosine_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN — the production 100 TB shape registered as a
    first-class query: IVF probing scopes WHICH (query, vector) pairs
    are considered (nprobe/C of the corpus), PQ-ADC scores only those
    candidates as M table-lookup sums (no vector math on the corpus),
    and the exact re-rank runs on the small approximate-top slice.
    Rows-only (recall < 1 by construction); the composition's recall,
    pruning, and clustered-corpus behavior are pinned by
    tests/test_pq.py::test_pq_scores_ivf_candidates and
    tests/test_ann_clustered.py."""
    from beametrics_spark.operators.ivf import (
        assign_cells,
        probe_cells,
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    centroids = train_ivf_centroids(spark, corpus)
    probed = probe_cells(
        spark,
        queries.select(
            F.col("query_id").alias("vec_id"), F.col("qv").alias("v")
        ),
        centroids,
    ).select(F.col("vec_id").alias("query_id"), "cell")
    assigned = assign_cells(spark, corpus, centroids)
    pairs = probed.join(assigned, "cell").select("query_id", "vec_id")

    codebooks, width = train_pq_codebooks(spark, corpus)
    codes = assign_codes(spark, corpus, codebooks, width)
    qtable = adc_query_table(spark, queries, codebooks, width)
    approx = (
        pairs.join(codes, "vec_id")
        .join(F.broadcast(qtable), ["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qdot").alias("approx_score"))
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.desc("approx_score"), F.asc("vec_id")
    )
    cands = (
        approx.withColumn("crk", F.row_number().over(w_cand))
        .filter(F.col("crk") <= RERANK_CAND)
        .select("query_id", "vec_id")
    )
    rerank = (
        cands.join(corpus, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn("sim", cosine_expr(F.col("qv"), F.col("v")))
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    return (
        rerank.withColumn("rk", F.row_number().over(w_final))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), "rk")
    )
