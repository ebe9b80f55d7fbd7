"""Hot-group cap tests: planted hot shingles / LSH buckets / neighborhood
keys must be dropped (bounded pair expansion) with an observable drop
count, while sub-cap near-dup structure survives, and the dropped blobs
remain covered by the exact-dup pre-pass.
"""

from contextlib import contextmanager

from pyspark.sql import Observation
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import (
    HOT_GROUP_CAP,
    dedup_exact,
    edit_distance_pairs,
    lsh_candidates,
    ngram_jaccard_pairs,
    simhash_pairs,
)


def _identical_docs(spark, n, text="c1 c2 c3 c4 c5"):
    return spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )


@contextmanager
def _aqe_off(spark):
    """Observation.get on a FULLY-empty result trips a PySpark 4 toPyRow
    assert under AQE empty-relation propagation (listener path and
    non-empty results are fine) — the planted-hot-blob tests drop every
    row by design, so they read metrics with AQE off."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_ngram_hot_gram_dropped_and_observed(spark):
    # 30 identical 5-token docs: ONE shingle, df=30 > cap=8. Without the
    # cap this gram alone would expand to C(30,2)=435 pairs at jaccard 1.
    docs = _identical_docs(spark, 30)
    obs = Observation()
    capped = ngram_jaccard_pairs(docs, cap=8, cap_metric=obs)
    with _aqe_off(spark):
        assert capped.count() == 0
        assert obs.get["n_dropped"] == 1  # exactly the planted hot gram

    # uncapped control: the same corpus does produce the 435 pairs
    assert ngram_jaccard_pairs(docs, cap=HOT_GROUP_CAP).count() == 435


def test_ngram_subcap_pair_survives_alongside_hot_gram(spark):
    # two genuine near-dups (19/20 shared tokens) + a 30-doc hot blob;
    # with cap=8 the blob is dropped but the real pair is still found
    base = " ".join(f"w{i}" for i in range(20))
    variant = " ".join(f"w{i}" for i in range(19)) + " z9"
    docs = _identical_docs(spark, 30).union(
        spark.createDataFrame(
            [(100, base), (101, variant)], "doc_id long, text string"
        )
    )
    out = ngram_jaccard_pairs(docs, cap=8).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(100, 101)]


def test_lsh_hot_bucket_dropped_and_observed(spark):
    # identical docs share every band signature: 16 hot buckets of 30 ids
    docs = _identical_docs(spark, 30)
    obs = Observation()
    with _aqe_off(spark):
        assert lsh_candidates(docs, cap=8, cap_metric=obs).count() == 0
        assert obs.get["n_dropped"] == 16  # one per band

    assert lsh_candidates(docs, cap=HOT_GROUP_CAP).count() == 435


def test_hot_blob_still_covered_by_exact_dedup(spark, tmp_path):
    # the recall argument for the cap: the dropped blob is all-identical,
    # so the exact-dup pre-pass reports it as one group of 30 copies
    docs = _identical_docs(spark, 30)
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = dedup_exact(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].n_copies == 30 and out[0].keep_id == 0


def test_edit_distance_hot_key_dropped_and_observed(spark):
    # 12 strings 'a?' all share deletion-neighborhood key 'a'; every pair
    # is a substitution pair meeting ONLY through that key, so a cap of 8
    # drops all of them (the documented explicit approximation)
    vocab = [("a" + c,) for c in "bcdefghijklm"]
    keys = spark.createDataFrame(vocab, "s string")
    obs = Observation()
    with _aqe_off(spark):
        assert edit_distance_pairs(keys, cap=8, cap_metric=obs).count() == 0
        assert obs.get["n_dropped"] == 1  # the hot key 'a'

    assert edit_distance_pairs(keys, cap=HOT_GROUP_CAP).count() == 66


def test_edit_distance_empty_string_guarded(spark):
    # sequence(1, 0) is descending in Spark — a blank entry must yield no
    # spurious neighborhood keys (every 1-char string is ED 1 from "")
    keys = spark.createDataFrame([("",), ("a",), ("b",)], "s string")
    out = edit_distance_pairs(keys).collect()
    assert {(r.str_a, r.str_b) for r in out} == {("a", "b")}


def test_simhash_hot_bucket_dropped(spark):
    # identical docs share the signature, hence all 4 band buckets
    docs = _identical_docs(spark, 30, text="alpha beta gamma delta")
    obs = Observation()
    with _aqe_off(spark):
        assert simhash_pairs(docs, cap=8, cap_metric=obs).count() == 0
        assert obs.get["n_dropped"] == 4  # one hot bucket per band

    assert simhash_pairs(docs, cap=HOT_GROUP_CAP).count() == 435


def test_caps_never_trigger_at_test_sf(spark, sf_dir):
    # oracle parity for the ngram/LSH paths relies on the default cap
    # being far above any real posting list / bucket at the shipped SFs
    # (measured sf0.1 maxima: shingle df 4, LSH bucket 4). simhash is
    # different: its buckets DO exceed the cap at sf0.1 (~1.6k docs —
    # degenerate banding on this vocabulary), which is why its cap is
    # part of the operator contract and appears in the oracle SQL itself.
    from beametrics_spark.operators.dedup import shingle_table
    from beametrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    max_df = (
        shingle_table(docs)
        .groupBy("s")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_df < HOT_GROUP_CAP


def test_dedup_bodies_handle_empty_input(spark):
    """Empty partitions/days are routine at scale: every dedup body must
    return an empty result, not crash (empty collect_list groups, empty
    connected-components label table, empty broadcast sides)."""
    from beametrics_spark.operators.curation import dedup_keep_list
    from beametrics_spark.operators.dedup import (
        classify_incremental,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_keys = spark.createDataFrame([], "s string")
    assert ngram_jaccard_pairs(empty_docs).count() == 0
    assert minhash_lsh_pairs(empty_docs).count() == 0
    assert simhash_pairs(empty_docs).count() == 0
    assert edit_distance_pairs(empty_keys).count() == 0
    assert dedup_keep_list(spark, empty_docs).count() == 0
    assert classify_incremental(empty_docs, empty_docs).count() == 0


def test_dedup_handles_unicode_text(spark):
    """Multibyte text (CJK, emoji) flows through tokenization, hashing,
    and pair generation without mangling: identical unicode docs dedup
    exactly and near-dup unicode docs pair up."""
    base = "日本語 の テキスト 処理 は 楽しい です ね 🙂 終わり"
    variant = "日本語 の テキスト 処理 は 楽しい です ね 🙂 完了"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, variant)], "doc_id long, text string"
    )
    out = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs).collect()}
    assert (0, 1) in out  # identical unicode docs: jaccard 1
    # one trailing token changed on a 10-token doc: 5/7 shared 6-gram...
    # with width 5: shingles 6, shared 5, union 7 → 0.714 < 0.8 (absent)
    assert (0, 2) not in out
