"""Unit tests for beyond-reference operators: dedup primitives,
similarity expressions, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import (
    cosine_expr,
    lsh_candidate_pairs,
    minhash_expr,
    shingles_expr,
)
from beametrics_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    media_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "a b c d e f g h i j k l m n o p"
    near = "a b c d e f g h i j k l m n o q"  # one token changed
    other = "z y x w v u t s r q p o n m l k"
    return spark.createDataFrame(
        [(0, base), (1, near), (2, other)], "doc_id long, text string"
    )


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    out = df.select(shingles_expr(F.col("text")).alias("sh")).first()["sh"]
    assert out == ["a b c d e", "b c d e f"]


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = df.select(shingles_expr(F.col("text")).alias("sh")).first()["sh"]
    assert out == []


def test_minhash_similarity_ordering(docs):
    """Near-identical docs share most minhashes; unrelated docs share few."""
    sigs = docs.select(
        "doc_id", shingles_expr(F.col("text")).alias("sh")
    ).select("doc_id", minhash_expr(F.col("sh"), 32).alias("sig"))
    rows = {r["doc_id"]: r["sig"] for r in sigs.collect()}
    agree_near = sum(a == b for a, b in zip(rows[0], rows[1]))
    agree_far = sum(a == b for a, b in zip(rows[0], rows[2]))
    assert agree_near > 20  # jaccard ~0.7 on shingles
    assert agree_far == 0


def test_lsh_finds_planted_pair(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_cosine_expr_matches_math(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    got = df.select(cosine_expr(F.col("a"), F.col("b")).alias("c")).first()["c"]
    expected = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert abs(got - expected) < 1e-12


def test_media_table_and_fake_decode(spark, sf_dir):
    media = media_table(spark, sf_dir)
    assert media.columns == ["doc_id", "media_type", "payload", "n_bytes"]
    decoded = decode_media(media, fake=True)
    assert decoded.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,n_bytes:bigint,"
        "width:int,height:int,duration_ms:int,feature:array<double>>"
    )
    rows = decoded.limit(5).collect()
    assert all(16 <= r["width"] < 256 for r in rows)
    # deterministic: same payload → same fake dims
    again = decode_media(media, fake=True).limit(5).collect()
    assert [r["width"] for r in rows] == [r["width"] for r in again]
    # images have no duration
    img = decoded.filter(F.col("media_type") == "image").first()
    assert img["duration_ms"] == 0


def test_decode_without_codec_raises(spark, sf_dir):
    media = media_table(spark, sf_dir).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        decode_media(media, fake=False).collect()


def test_sample_frames(spark, sf_dir):
    media = media_table(spark, sf_dir)
    decoded = decode_media(media, fake=True)
    frames = sample_frames(decoded, every_ms=1000)
    joined = frames.groupBy("doc_id").count().join(
        decoded.select("doc_id", "duration_ms"), "doc_id"
    )
    r = joined.first()
    assert r["count"] == max(r["duration_ms"] - 1, 0) // 1000 + 1


def test_brp_lsh_variant(spark, sf_dir):
    """pyspark.ml BucketedRandomProjectionLSH as the third ANN path."""
    ml = pytest.importorskip("pyspark.ml.feature")
    from pyspark.ml.functions import array_to_vector

    from beametrics_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("vec")
    )
    lsh = ml.BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = lsh.fit(emb)
    key = emb.first()["vec"]
    nn = model.approxNearestNeighbors(emb, key, 5)
    assert nn.count() == 5


def test_edit_distance_pairs_complete_vs_bruteforce(spark, sf_dir):
    """The deletion-neighborhood join finds EXACTLY the brute-force ED≤1
    pair set — blocking loses nothing, verification removes the
    false candidates (e.g. transposition pairs at distance 2)."""
    from beametrics_spark.operators.dedup import dedup_edit_distance_pairs
    from beametrics_spark.sources import load_table

    out = {
        (r["str_a"], r["str_b"], r["ed"])
        for r in dedup_edit_distance_pairs(spark, sf_dir).collect()
    }
    assert out
    docs = load_table(spark, sf_dir, "documents")
    keys = docs.select(
        F.concat(
            F.lit("item-"),
            (F.col("doc_id") / 2).cast("long").cast("string"),
            F.when(F.col("doc_id") % 2 == 1, F.lit("x")).otherwise(F.lit("")),
        ).alias("s")
    ).distinct()
    a = keys.select(F.col("s").alias("str_a"))
    b = keys.select(F.col("s").alias("str_b"))
    brute = {
        (r["str_a"], r["str_b"], r["ed"])
        for r in a.join(b, F.col("str_a") < F.col("str_b"))
        .select("str_a", "str_b", F.levenshtein("str_a", "str_b").alias("ed"))
        .filter(F.col("ed") <= 1)
        .collect()
    }
    assert out == brute
    assert all(ed <= 1 for _, _, ed in out)


def test_incremental_dedup_classification(spark, sf_dir):
    """Planted duplicates: corpus-dup beats batch-dup; first batch
    occurrence of a batch-internal dup is 'new', later ones dup_in_batch."""
    from beametrics_spark.operators.dedup import (
        classify_incremental,
        dedup_incremental_batch,
    )

    corpus = spark.createDataFrame(
        [(0, "known text"), (1, "other known")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "known text"),     # dup of corpus
            (11, "fresh text"),     # new
            (12, "fresh text"),     # dup within batch (11 came first)
            (13, "known text"),     # corpus-dup wins over batch-dup
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"] for r in classify_incremental(corpus, batch).collect()}
    assert out == {
        10: "dup_of_corpus",
        11: "new",
        12: "dup_in_batch",
        13: "dup_of_corpus",
    }
    # registry entry runs on the real table and covers the whole batch
    rows = dedup_incremental_batch(spark, sf_dir).collect()
    assert rows and {r["status"] for r in rows} <= {"dup_of_corpus", "dup_in_batch", "new"}
