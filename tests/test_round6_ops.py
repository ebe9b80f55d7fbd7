"""Round-6 wave: substring-run dedup, passage dedup, SemDeDup, weighted
sampling without replacement, count-min audit.

Semantics are verified against independent pure-Python recomputation
(hashlib md5 / numpy cosine), not against the operators' own helpers —
the same engine-free strategy as test_dedup_properties.py.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup2 import (
    PASSAGE_WIDTH,
    RUN_WIDTH,
    SEM_TAU,
    dedup_substring_runs,
    passage_dedup_rate,
    semdedup_prune_list,
)
from beametrics_spark.operators.sampling import SAMPLE_K, weighted_sample_wor
from beametrics_spark.sources import load_table


def _docs_df(spark, texts):
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


# --- dedup_substring_runs ----------------------------------------------------


def _runs_on(spark, texts):
    from beametrics_spark.operators import dedup2

    docs = _docs_df(spark, texts)
    # reuse the operator body via a monkeypatched loader-free path:
    # the registered fn loads from sf_dir, so rebuild inline
    import beametrics_spark.operators.dedup2 as mod

    orig = mod.load_table
    mod.load_table = lambda s, d, n: docs
    try:
        return {
            r["doc_id"]: r.asDict()
            for r in dedup2.dedup_substring_runs(spark, "unused").collect()
        }
    finally:
        mod.load_table = orig


def test_substring_run_detected_with_exact_cover(spark):
    shared = _words("s", 12)  # 12-token run shared by docs 0 and 1
    texts = [
        shared + " " + _words("a", 20),
        _words("b", 20) + " " + shared,
        _words("c", 40),
    ]
    out = _runs_on(spark, texts)
    assert set(out) == {0, 1}
    for doc in (0, 1):
        r = out[doc]
        # a 12-token shared span yields 12-W+1 = 5 consecutive dup grams
        # in one island covering exactly 12 tokens
        assert r["n_runs"] == 1
        assert r["dup_tokens"] == 12
        assert r["longest_run_tokens"] == 12
    assert out[0]["dup_token_frac"] == round(12 / 32, 4)


def test_substring_overlapping_islands_union_not_sum(spark):
    # doc0 holds A0..A11 contiguously; doc1 holds A0..A7 and A4..A11 as
    # two NON-adjacent copies. In doc0, the duplicated grams are the
    # ones doc1 also has — positions 0 and 4 only (grams 1-3 span token
    # runs doc1 never contains contiguously) — so doc0 has two gram
    # islands whose token intervals [0,7] and [4,11] OVERLAP. The exact
    # cover must be the union (12 tokens, one merged run); summing raw
    # spans would double-count tokens 4..7 and report 16.
    w = RUN_WIDTH
    A = [f"A{i}" for i in range(w + 4)]  # 12 tokens at w=8
    texts = [
        " ".join(A) + " " + _words("f", 10),
        " ".join(A[:w]) + " ZSEP " + " ".join(A[4:]) + " " + _words("g", 10),
    ]
    out = _runs_on(spark, texts)
    r0 = out[0]
    assert r0["n_runs"] == 1, r0
    assert r0["dup_tokens"] == w + 4
    assert r0["longest_run_tokens"] == w + 4
    # doc1's two copies are separated (gap > 0 in token space after the
    # interval extension), so they stay two runs of w tokens each
    r1 = out[1]
    assert r1["n_runs"] == 2, r1
    assert r1["dup_tokens"] == 2 * w
    assert r1["longest_run_tokens"] == w


def test_substring_intra_doc_repeat_not_counted(spark):
    # the same run twice within ONE doc only — cross-doc df is 1,
    # so nothing is reported
    rep = _words("r", RUN_WIDTH)
    texts = [rep + " " + _words("m", 5) + " " + rep, _words("z", 30)]
    out = _runs_on(spark, texts)
    assert out == {}


# --- passage_dedup_rate -------------------------------------------------------


def test_passage_dedup_counts_exact_blocks(spark):
    from beametrics_spark.operators import dedup2 as mod

    p = PASSAGE_WIDTH
    block = _words("p", p)
    texts = [
        block + " " + _words("a", p),  # passages: [block, a-block]
        block + " " + _words("b", p),  # passages: [block, b-block]
        _words("short", p - 1),  # too short: excluded entirely
    ]
    docs = _docs_df(spark, texts)
    orig = mod.load_table
    mod.load_table = lambda s, d, n: docs
    try:
        rows = {r["source"]: r.asDict() for r in passage_dedup_rate(spark, "x").collect()}
    finally:
        mod.load_table = orig
    r = rows["src0"]
    assert r["n_passages"] == 4
    assert r["n_dup_passages"] == 2  # the two copies of `block`
    assert r["dup_rate"] == 0.5


# --- weighted_sample_wor -------------------------------------------------------


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_weighted_sample_matches_pure_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    expect = {}
    by_src = {}
    for r in docs:
        if r["n_chars"] and r["n_chars"] > 0:
            by_src.setdefault(r["source"], []).append((r["doc_id"], r["n_chars"]))
    for src, items in by_src.items():
        keyed = [
            (math.log((_md5_60(f"wsr:{d}") + 1) / float(1 << 60)) / w, d, w)
            for d, w in items
        ]
        keyed.sort(key=lambda t: (-t[0], t[1]))
        expect[src] = [
            (src, rk + 1, d, w) for rk, (_k, d, w) in enumerate(keyed[:SAMPLE_K])
        ]
    got = {}
    for r in weighted_sample_wor(spark, sf_dir).collect():
        got.setdefault(r["source"], []).append(
            (r["source"], r["rank"], r["doc_id"], r["weight"])
        )
    for src in got:
        got[src].sort(key=lambda t: t[1])
    assert got == expect


def test_weighted_sample_rank_bounds(spark, sf_dir):
    rows = weighted_sample_wor(spark, sf_dir).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["rank"])
    for src, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= SAMPLE_K


# --- semdedup_prune_list --------------------------------------------------------


def test_semdedup_matches_numpy_recompute(spark, sf_dir):
    """Independent numpy re-implementation of the full quantizer-TREE
    protocol + within-cluster prune — Knuth-hash seed pick, frozen
    constant-branching upper tree (retained centroids self-parent, new
    centroids descend), hierarchical leaf assignment, one Lloyd pass on
    the leaf centroids, re-route, re-assign."""
    np = pytest.importorskip("numpy")
    import math

    from beametrics_spark.operators.dedup2 import (
        SEM_MIN_CLUSTERS,
        SEM_SEED_MULT,
        SEM_TARGET_CLUSTER,
        _sem_tree_sizes,
    )

    emb = load_table(spark, sf_dir, "embeddings").collect()
    ids = [r["vec_id"] for r in emb]
    V = {r["vec_id"]: np.array(r["embedding"], dtype="float64") for r in emb}

    n = len(ids)
    k = max(SEM_MIN_CLUSTERS, math.ceil(n / SEM_TARGET_CLUSTER))
    sizes = _sem_tree_sizes(k)
    order = sorted(ids, key=lambda i: ((i * SEM_SEED_MULT) % 2**32, i))[:k]

    def unit(v):
        return v / np.linalg.norm(v)

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    fine = {fid: unit(V[vid]) for fid, vid in enumerate(order)}

    def argmax(v, cents):
        return min(((-float(v @ c), cid) for cid, c in cents.items()))[1]

    # frozen upper tree: parents[level_index][fid] -> parent node
    parents: list[dict] = [{fid: None for fid in range(sizes[0])}]

    def descend(v, upto):
        node = argmax(v, {f: fine[f] for f in range(sizes[0])})
        for li in range(1, upto):
            cands = {
                f: fine[f] for f, par in parents[li].items() if par == node
            }
            node = argmax(v, cands)
        return node

    for li in range(1, len(sizes)):
        pmap = {fid: fid for fid in range(sizes[li - 1])}
        for fid in range(sizes[li - 1], sizes[li]):
            pmap[fid] = descend(fine[fid], li)
        parents.append(pmap)

    top = sizes[-1]

    def assign_all(leaf_cents, routes):
        by_node = {}
        for fid, node in routes.items():
            by_node.setdefault(node, []).append(fid)
        out = {}
        for i in ids:
            node = descend(V[i], len(sizes))
            cands = {fid: leaf_cents[fid] for fid in by_node[node]}
            out[i] = argmax(V[i], cands)
        return out

    # seed-leaf routing: tree members self-route, the rest descend
    route0 = {
        fid: (fid if fid < top else descend(fine[fid], len(sizes)))
        for fid in fine
    }
    a0 = assign_all(fine, route0)
    sums, cnts = {}, {}
    for i, fid in a0.items():
        sums[fid] = sums.get(fid, 0) + V[i]
        cnts[fid] = cnts.get(fid, 0) + 1
    fine1 = {
        fid: (unit(sums[fid] / cnts[fid]) if fid in cnts else fv)
        for fid, fv in fine.items()
    }
    # trained leaves are new vectors: ALL re-route by full descent
    route1 = {fid: descend(fv, len(sizes)) for fid, fv in fine1.items()}
    assign = assign_all(fine1, route1)
    clusters = {}
    for i, c in assign.items():
        clusters.setdefault(c, []).append(i)
    expect = {}
    for c, members in clusters.items():
        members.sort()
        for bi, b in enumerate(members):
            cands = []
            for a in members[:bi]:
                s = cos(V[a], V[b])
                if s >= SEM_TAU:
                    cands.append((-s, a))
            if cands:
                s, a = min(cands)
                expect[b] = (c, a, round(-s, 6))

    got = {
        r["pruned_vec_id"]: (r["cluster"], r["keep_vec_id"], r["cos_sim"])
        for r in semdedup_prune_list(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "fixture must produce a non-trivial prune list"


def test_semdedup_prune_semantics(spark, sf_dir):
    rows = semdedup_prune_list(spark, sf_dir).collect()
    pruned = [r["pruned_vec_id"] for r in rows]
    assert len(pruned) == len(set(pruned)), "one keeper per pruned vector"
    for r in rows:
        assert r["keep_vec_id"] < r["pruned_vec_id"]
        assert r["cos_sim"] >= SEM_TAU - 1e-9


# --- countmin_error_audit -------------------------------------------------------


def test_countmin_audit_invariants(spark, sf_dir):
    from beametrics_spark.operators.scale_patterns import countmin_error_audit

    row = countmin_error_audit(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    n_keys = ev.select("user_id").distinct().count()
    assert row["n_keys"] == n_keys
    # CMS never underestimates — a violation means the hash expansion
    # or the min-over-rows is broken
    assert row["min_error"] == 0 or row["min_error"] > 0
    assert row["min_error"] >= 0
    assert 0 <= row["n_exact"] <= n_keys
    assert row["max_overestimate"] >= 0
    # Markov tail: err <= 2N/w holds per key with prob >= 1 - 2^-d;
    # on the fixture it holds for every key (deterministic given data)
    assert row["n_within_markov_bound"] >= int(0.9 * n_keys)
