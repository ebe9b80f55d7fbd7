"""ANN pruning demonstrated on a CLUSTERABLE corpus (VERDICT r5 #4).

The shipped test embeddings are near-uniform (random vectors are almost
orthogonal), which caps every ANN method's measured recall-at-scan —
cells can't tighten around structure that isn't there. Real-world
embedding corpora are heavily clustered; this module plants a
deterministic Gaussian mixture (seeded numpy, unit-norm centers,
sigma << center separation) and proves the SAME IVF/PQ building blocks
used by the registry queries actually prune on it:

  * IVF: recall >= 0.9 at <= 0.3 of the corpus scored
  * PQ-ADC + exact re-rank: recall >= 0.9 while scoring only code sums
  * IVF cells align with planted clusters (purity check)

scripts/ann_sweep.py --clustered reproduces the full nprobe sweep.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

N_CLUSTERS = 10
PER_CLUSTER = 200
DIM = 32
N_Q = 20
SIGMA = 0.08
TOP_K = 10


def make_clustered(spark, *, n_clusters=N_CLUSTERS, per=PER_CLUSTER,
                   dim=DIM, n_queries=N_Q, sigma=SIGMA, seed=7):
    """Planted Gaussian mixture: unit-norm centers, tight isotropic
    noise; queries are fresh draws from the same mixture. vec_id <
    n_queries are queries (mirroring the embeddings-table convention).
    Deterministic: seeded RandomState, no wall-clock anywhere."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    labels = {}
    for i in range(n_queries):
        c = i % n_clusters
        v = centers[c] + sigma * rng.normal(size=dim)
        labels[i] = c
        rows.append((i, [float(x) for x in v]))
    for j in range(n_clusters * per):
        c = j % n_clusters
        v = centers[c] + sigma * rng.normal(size=dim)
        vid = n_queries + j
        labels[vid] = c
        rows.append((vid, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    return df, labels


@pytest.fixture(scope="module")
def clustered(spark):
    df, labels = make_clustered(spark)
    return df.localCheckpoint(), labels


def brute_topk(corpus, queries, k=TOP_K):
    from beametrics_spark.operators.dedup import cosine_expr

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        corpus.join(F.broadcast(queries))
        .withColumn("sim", cosine_expr(F.col("qv"), F.col("v")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id")
    )


def test_ivf_prunes_clustered_corpus(spark, clustered):
    from beametrics_spark.operators.ivf import (
        assign_cells,
        probe_cells,
        train_ivf_centroids,
    )
    from beametrics_spark.operators.dedup import cosine_expr

    emb, _ = clustered
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    centroids = train_ivf_centroids(spark, corpus, cells=16, iters=2)
    assigned = corpus.join(assign_cells(spark, corpus, centroids), "vec_id")
    probes = (
        probe_cells(
            spark,
            emb.filter(F.col("vec_id") < N_Q),
            centroids,
            nprobe=3,
        )
        .withColumnRenamed("vec_id", "query_id")
        .join(queries, "query_id")
    )
    cand = assigned.join(F.broadcast(probes), "cell")
    n_scored = cand.count()
    scan_fraction = n_scored / (N_Q * corpus.count())
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    approx = {
        (r["query_id"], r["vec_id"])
        for r in (
            cand.withColumn("sim", cosine_expr(F.col("qv"), F.col("v")))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "vec_id")
        ).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_topk(corpus, queries).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"clustered IVF recall {recall:.3f} < 0.9"
    assert scan_fraction <= 0.3, (
        f"clustered IVF scanned {scan_fraction:.3f} > 0.3 of the corpus"
    )


def test_ivf_cells_align_with_planted_clusters(spark, clustered):
    """Majority-label purity of the trained cells: the coarse quantizer
    must actually discover the planted structure (this is what the
    near-uniform fixture could never show)."""
    from beametrics_spark.operators.ivf import (
        assign_cells,
        train_ivf_centroids,
    )

    emb, labels = clustered
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    centroids = train_ivf_centroids(spark, corpus, cells=16, iters=2)
    asg = assign_cells(spark, corpus, centroids).collect()
    from collections import Counter, defaultdict

    per_cell = defaultdict(Counter)
    for r in asg:
        per_cell[r["cell"]][labels[r["vec_id"]]] += 1
    pure = sum(c.most_common(1)[0][1] for c in per_cell.values())
    total = sum(sum(c.values()) for c in per_cell.values())
    assert pure / total >= 0.95, f"cell purity {pure / total:.3f} < 0.95"


def test_pq_recall_on_clustered_corpus(spark, clustered):
    """PQ on tight clusters: every member of a planted cluster encodes
    to near-identical codes, so ADC scores are tied WITHIN the cluster —
    the candidate slice must cover the quantization-equivalence class
    (>= cluster size) for the exact re-rank to see the true neighbors.
    With the default 50-deep slice recall is ~0.54 (measured): ADC
    correctly finds the right cluster but cannot rank inside it. A
    cluster-covering re-rank depth is required in BOTH the standalone
    and the IVF-composed shape (see test_ivfpq_composed_on_clustered_
    corpus) — what composition buys is scan scope, not within-cluster
    ADC resolution."""
    from beametrics_spark.operators.dedup import cosine_expr
    from beametrics_spark.operators.pq import (
        adc_query_table,
        assign_codes,
        train_pq_codebooks,
    )

    RERANK_CAND = PER_CLUSTER + 56  # cover one full planted cluster

    emb, _ = clustered
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    codebooks, width = train_pq_codebooks(spark, corpus)
    codes = assign_codes(spark, corpus, codebooks, width)
    qtable = adc_query_table(spark, queries, codebooks, width)
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
    rerank = (
        cands.join(corpus, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn("sim", cosine_expr(F.col("qv"), F.col("v")))
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    got = {
        (r["query_id"], r["vec_id"])
        for r in (
            rerank.withColumn("rk", F.row_number().over(w_final))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "vec_id")
        ).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_topk(corpus, queries).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"clustered PQ recall {recall:.3f} < 0.9"


def test_ivfpq_composed_on_clustered_corpus(spark, clustered):
    """The registered IVF-PQ composition on the clustered corpus. What
    composing buys is SCAN SCOPE: the ADC lookup scan and the exact
    re-rank both run only over the probed cells' candidates (~30% of
    the corpus here) instead of every code row. What it does NOT buy is
    within-cluster ADC resolution — tight clusters encode to
    near-identical codes in BOTH shapes (measured: composed recall with
    the default 50-deep slice is 0.540, identical to standalone PQ), so
    the re-rank depth must cover the quantization-tie class either way.
    With a cluster-covering slice the composition reaches full recall
    while touching a fraction of the corpus — asserted on both axes."""
    from beametrics_spark.operators.dedup import cosine_expr
    from beametrics_spark.operators.ivf import (
        assign_cells,
        probe_cells,
        train_ivf_centroids,
    )
    from beametrics_spark.operators.pq import (
        adc_query_table,
        assign_codes,
        train_pq_codebooks,
    )

    RERANK_CAND = PER_CLUSTER + 56  # cover one full planted cluster

    emb, _ = clustered
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    centroids = train_ivf_centroids(spark, corpus, cells=16, iters=2)
    probed = probe_cells(
        spark,
        emb.filter(F.col("vec_id") < N_Q),
        centroids,
        nprobe=3,
    ).select(F.col("vec_id").alias("query_id"), "cell")
    assigned = assign_cells(spark, corpus, centroids)
    pairs = probed.join(assigned, "cell").select("query_id", "vec_id")
    scan_fraction = pairs.count() / (N_Q * corpus.count())

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
    got = {
        (r["query_id"], r["vec_id"])
        for r in (
            rerank.withColumn("rk", F.row_number().over(w_final))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "vec_id")
        ).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_topk(corpus, queries).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"clustered IVF-PQ recall {recall:.3f} < 0.9"
    assert scan_fraction <= 0.35, (
        f"IVF-PQ ADC scan touched {scan_fraction:.3f} > 0.35 of the corpus"
    )
