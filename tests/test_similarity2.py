"""Wave-2 embedding operators: centroids, nearest-centroid assignment,
int8 quantization.

Shape + invariant checks; value parity runs through
scripts/oracle_check.py (all three have DuckDB oracles).
"""

from pyspark.sql import functions as F

from beametrics_spark.operators.similarity2 import (
    DIM,
    embedding_centroid_assign,
    embedding_centroids_per_label,
    embedding_quantize_int8,
)


def test_centroids_grid_complete(spark, sf_dir):
    rows = embedding_centroids_per_label(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    assert len(rows) == n_labels * DIM
    assert {r["dim"] for r in rows} == set(range(1, DIM + 1))


def test_assign_one_row_per_vector(spark, sf_dir):
    df = embedding_centroid_assign(spark, sf_dir)
    rows = df.collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    for r in rows:
        assert -1.0 <= r["cos_sim"] <= 1.0
    # centroids are label means, so SOME vectors should land on their own
    # label's centroid (the clustering signal exists even in random data)
    own = sum(1 for r in rows if r["assigned_label"] == r["label"])
    assert own > 0
    # the corpus-side plan must broadcast centroids, not shuffle vectors
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_quantize_bounds_and_roundtrip(spark, sf_dir):
    rows = embedding_quantize_int8(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    assert len(rows) == len(emb)
    for r in rows[:50]:
        assert r["scale"] > 0
        # q is a comma-joined int8 string (driver-hashable; see operator docstring)
        q = [int(x) for x in r["q"].split(",")]
        assert len(q) == DIM
        assert all(-127 <= qi <= 127 for qi in q)
        # the max-|x| component must quantize to ±127 exactly
        assert max(abs(qi) for qi in q) == 127
        # dequantization error bounded by scale/254 per component
        v = emb[r["vec_id"]]
        for qi, xi in zip(q, v):
            assert abs(qi * r["scale"] / 127 - xi) <= r["scale"] / 127


def test_quantize_zero_vector(spark):
    docs = spark.createDataFrame(
        [(1, [0.0] * DIM, 0), (2, [1.0] + [0.0] * (DIM - 1), 1)],
        "vec_id long, embedding array<float>, label int",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="qz_")
    docs.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    rows = {r["vec_id"]: r for r in embedding_quantize_int8(spark, d).collect()}
    assert rows[1]["scale"] == 0.0
    assert all(int(q) == 0 for q in rows[1]["q"].split(","))
    assert int(rows[2]["q"].split(",")[0]) == 127
