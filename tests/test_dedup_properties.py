"""Property-based cross-check: the inverted-index Jaccard pair engine
must equal a direct Python brute force on arbitrary small corpora —
random vocabularies, duplicated docs, short docs (< shingle width),
repeated tokens. Catches counting bugs no fixed fixture would.
"""

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings, strategies as st

from beametrics_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    SHINGLE_WIDTH,
    ngram_jaccard_pairs,
)


def _python_shingles(text: str) -> set[str]:
    toks = text.split()
    if len(toks) < SHINGLE_WIDTH:
        return set()
    return {
        " ".join(toks[i : i + SHINGLE_WIDTH])
        for i in range(len(toks) - SHINGLE_WIDTH + 1)
    }


def _python_pairs(docs: list[tuple[int, str]]) -> set[tuple[int, int, float]]:
    sh = {i: _python_shingles(t) for i, t in docs}
    out = set()
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            j = inter / union
            if j >= JACCARD_THRESHOLD:
                # Spark round() is HALF_UP; Python round() is banker's —
                # j = 13/16 = 0.8125 would diverge (0.813 vs 0.812)
                j3 = float(
                    Decimal(j).quantize(Decimal("0.001"), ROUND_HALF_UP)
                )
                out.add((a, b, j3))
    return out


# small vocab forces shingle collisions; doc lengths straddle the width
_doc = st.lists(
    st.sampled_from([f"t{i}" for i in range(6)]), min_size=0, max_size=12
).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc, min_size=2, max_size=10))
def test_ngram_jaccard_matches_python_bruteforce(spark, texts):
    docs = list(enumerate(texts))
    expected = _python_pairs(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(df).collect()
    }
    assert got == expected


def _python_ed1_pairs(vocab: list[str]) -> set[tuple[str, str]]:
    import itertools

    def ed(a: str, b: str) -> int:
        # classic DP, fine at property-test sizes
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    uniq = sorted(set(v for v in vocab if v))  # engine excludes blanks
    return {
        (a, b)
        for a, b in itertools.combinations(uniq, 2)
        if ed(a, b) <= 1
    }


# short strings over a 3-letter alphabet maximize neighborhood collisions
_word = st.text(alphabet="abc", min_size=0, max_size=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vocab=st.lists(_word, min_size=2, max_size=12))
def test_edit_distance_pairs_matches_python_bruteforce(spark, vocab):
    """SymSpell deletion-neighborhood completeness on arbitrary
    vocabularies (duplicates, blanks, 1-char strings): every ED<=1 pair
    must surface, and the exact-verify step must kill the superset."""
    from beametrics_spark.operators.dedup import edit_distance_pairs

    expected = _python_ed1_pairs(vocab)
    keys = spark.createDataFrame([(v,) for v in vocab], "s string").distinct()
    got = {
        (r.str_a, r.str_b) for r in edit_distance_pairs(keys).collect()
    }
    assert got == expected
