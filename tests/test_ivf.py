"""IVF ANN: recall vs brute force, pruning, determinism."""

from pyspark.sql import functions as F

from beametrics_spark.operators.ivf import (
    N_CELLS,
    assign_cells,
    ann_cosine_topk_ivf,
    train_ivf_centroids,
)
from beametrics_spark.operators.similarity import (
    N_QUERIES,
    ann_cosine_topk_bruteforce,
)
from beametrics_spark.sources import load_table


def test_ivf_recall_and_pruning(spark, sf_dir):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in ann_cosine_topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann_cosine_topk_ivf(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"

    # pruning is real: every cell is non-empty on average and the probed
    # fraction is bounded by nprobe/cells
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    centroids = train_ivf_centroids(spark, corpus)
    assert len(centroids) == N_CELLS
    counts = (
        assign_cells(spark, corpus, centroids)
        .groupBy("cell")
        .count()
        .collect()
    )
    assert len(counts) >= N_CELLS // 2  # clusters actually used
    biggest = max(r["count"] for r in counts)
    assert biggest < corpus.count()  # not everything in one cell


def test_lsh_recall_and_pruning(spark, sf_dir):
    """Multi-probe hyperplane LSH: recall floor + the candidate set
    actually pruned (scores strictly fewer pairs than brute force)."""
    from beametrics_spark.operators.similarity import (
        ann_cosine_topk_lsh,
        banded_buckets,
        with_signatures,
    )

    exact = {
        (r["query_id"], r["vec_id"])
        for r in ann_cosine_topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann_cosine_topk_lsh(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall:.2f} below floor"

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    banded = banded_buckets(with_signatures(spark, emb, 64))
    n_corpus = emb.filter(F.col("vec_id") >= N_QUERIES).count()
    # corpus-side bucket rows stay at N_BANDS per vector — the scale invariant
    from beametrics_spark.operators.similarity import N_BANDS

    assert (
        banded.filter(F.col("vec_id") >= N_QUERIES).count() == N_BANDS * n_corpus
    )


def test_ivf_deterministic(spark, sf_dir):
    a = sorted(
        (r["query_id"], r["vec_id"], r["rk"])
        for r in ann_cosine_topk_ivf(spark, sf_dir).collect()
    )
    b = sorted(
        (r["query_id"], r["vec_id"], r["rk"])
        for r in ann_cosine_topk_ivf(spark, sf_dir).collect()
    )
    assert a == b
