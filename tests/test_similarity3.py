"""Wave-3 embedding diagnostics: dim stats, norm outliers, kNN hub
histogram. Value parity runs through scripts/oracle_check.py; here:
shape, invariants, and the quadratic guard."""

import math

import pytest
from pyspark.sql import functions as F

from beametrics_spark.operators.similarity3 import (
    GRAPH_K,
    embedding_dim_stats,
    embedding_norm_outliers,
    knn_graph_hub_stats,
)


def test_dim_stats_shape_and_bounds(spark, sf_dir):
    rows = embedding_dim_stats(spark, sf_dir).collect()
    assert len(rows) == 64
    assert {r["dim"] for r in rows} == set(range(1, 65))
    for r in rows:
        assert r["min_x"] <= r["mean_x"] <= r["max_x"]
        assert r["std_x"] >= 0


def test_norm_outliers_are_actual_tails(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    norms = [
        math.sqrt(sum(x * x for x in r["v"])) for r in emb.collect()
    ]
    mu = sum(norms) / len(norms)
    sd = math.sqrt(sum((x - mu) ** 2 for x in norms) / (len(norms) - 1))
    expected = sum(1 for x in norms if abs(round((x - mu) / sd, 4)) > 2.0)
    got = embedding_norm_outliers(spark, sf_dir).collect()
    assert len(got) == expected
    assert all(abs(r["z"]) > 2.0 for r in got)


def test_hub_histogram_conserves_edges(spark, sf_dir):
    rows = knn_graph_hub_stats(spark, sf_dir).collect()
    n_vectors = sum(r["n_vectors"] for r in rows)
    total_in_degree = sum(r["in_degree"] * r["n_vectors"] for r in rows)
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    # every vector appears in exactly one bucket; each of the n vectors
    # emits exactly K out-edges, so in-degrees sum to n*K
    assert n_vectors == n
    assert total_in_degree == n * GRAPH_K


def test_hub_stats_guard_refuses_large_corpus(spark, sf_dir, monkeypatch):
    import beametrics_spark.operators.similarity3 as s3

    def tiny_guard(df, name, **kw):
        kw["limit"] = 10
        from beametrics_spark.functions import guard_quadratic

        return guard_quadratic(df, name, **kw)

    monkeypatch.setattr(s3, "guard_quadratic", tiny_guard)
    with pytest.raises(ValueError, match="refusing"):
        knn_graph_hub_stats(spark, sf_dir)


def test_quantization_error_within_bound(spark, sf_dir):
    from beametrics_spark.operators.similarity3 import (
        embedding_quantization_error,
    )

    rows = embedding_quantization_error(spark, sf_dir).collect()
    assert sum(r["n_vecs"] for r in rows) == 500
    for r in rows:
        # max component error can never exceed the half-step bound by
        # more than rounding slack; MSE is below the bound squared
        assert r["max_abs_err"] <= r["avg_err_bound"] * 2 + 1e-6
        assert 0 < r["avg_mse"] < (r["avg_err_bound"] * 2) ** 2


def test_whitened_norms_concentrate(spark, sf_dir):
    import math

    from beametrics_spark.operators.similarity3 import embedding_whitened_norms

    rows = embedding_whitened_norms(spark, sf_dir).collect()
    assert len(rows) == 500
    target = math.sqrt(64)
    mean = sum(r["whitened_norm"] for r in rows) / len(rows)
    # whitening normalizes each dimension: mean norm ~ sqrt(dim)
    assert abs(mean - target) < 0.15 * target


def test_hub_stats_over_lsh_edges(spark, sf_dir):
    """The 100 TB path executed end-to-end: LSH bucket-join candidate
    edges (never all-pairs) -> top-k per src -> knn_hub_stats_over.
    The histogram must cover the whole corpus (zero bucket included)
    and carry exactly corpus_size * GRAPH_K edges at most."""
    from pyspark.sql import Window

    from beametrics_spark.operators.dedup import cosine_expr
    from beametrics_spark.operators.similarity import (
        banded_buckets,
        with_signatures,
    )
    from beametrics_spark.operators.similarity3 import knn_hub_stats_over

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = emb.count()

    banded = banded_buckets(with_signatures(spark, emb, 64))
    left = banded.select(
        F.col("vec_id").alias("src"), F.col("v").alias("sv"), "band", "bucket"
    )
    right = banded.select(
        F.col("vec_id").alias("dst"), F.col("v").alias("dv"), "band", "bucket"
    )
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "sv", "dv")
        .distinct()
    )
    scored = candidates.withColumn(
        "sim", F.round(cosine_expr(F.col("sv"), F.col("dv")), 6)
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    edges = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GRAPH_K)
        .select("src", "dst")
    )

    hist = knn_hub_stats_over(edges, emb).collect()
    assert sum(r["n_vectors"] for r in hist) == n
    total_edges = sum(r["in_degree"] * r["n_vectors"] for r in hist)
    assert 0 < total_edges <= n * GRAPH_K
    # candidate generation actually pruned: fewer scored pairs than n^2
    assert candidates.count() < n * (n - 1)
