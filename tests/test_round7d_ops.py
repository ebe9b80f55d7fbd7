"""Round-7 wave 5: streaming contribution-cap twin, Matryoshka
truncation fidelity, bigram-LM quality scoring.

Same engine-free strategy: pure-Python recomputation over raw parquet
rows; the streaming twin is additionally checked row-for-row against
its batch twin (the parity contract).
"""

import math
from collections import Counter, defaultdict

from beametrics_spark.sources import load_table


def test_stream_contribution_cap_matches_batch(spark, sf_dir):
    from beametrics_spark.operators.curation4 import user_contribution_capping
    from beametrics_spark.operators.stream_parity import (
        stream_contribution_cap_parity,
    )

    def canon(df):
        return sorted(
            (
                r["event_type"],
                r["n_users"],
                r["n_events"],
                r["n_kept"],
                r["users_over_cap"],
                round(r["drop_rate"], 4),
            )
            for r in df.collect()
        )

    got = canon(stream_contribution_cap_parity(spark, sf_dir))
    want = canon(user_contribution_capping(spark, sf_dir))
    assert got == want
    assert len(got) == 5


def test_truncation_fidelity_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.similarity4 import (
        TRUNC_DIM,
        embedding_truncation_fidelity,
    )

    rows = load_table(spark, sf_dir, "embeddings").collect()
    per = defaultdict(list)
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        head = sum(x * x for x in v[:TRUNC_DIM])
        total = sum(x * x for x in v)
        per[r["label"]].append(head / total)

    expect = {
        l: (
            len(fr),
            round(sum(fr) / len(fr), 4),
            round(min(fr), 6),
            sum(1 for f in fr if f * 2 >= 1),
        )
        for l, fr in per.items()
    }
    got = {
        r["label"]: (
            r["n_vectors"],
            round(r["avg_energy_frac"], 4),
            round(r["min_energy_frac"], 6),
            r["n_majority_prefix"],
        )
        for r in embedding_truncation_fidelity(spark, sf_dir).collect()
    }
    assert got == expect
    # 16 of 64 dims should hold roughly a quarter of the energy on a
    # non-degenerate embedding table — nothing at 0 or 1
    for v in got.values():
        assert 0.0 < v[1] < 1.0


def test_bigram_logprob_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.text7 import bigram_logprob_quality

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].strip().split() for r in docs}

    bdt = defaultdict(Counter)  # doc -> bigram -> count
    for d, t in toks.items():
        for i in range(len(t) - 1):
            bdt[d][(t[i], t[i + 1])] += 1
    c2 = Counter()
    for d, bc in bdt.items():
        for bg, c in bc.items():
            c2[bg] += c
    c1 = Counter()
    for bg, c in c2.items():
        c1[bg[0]] += c
    vocab = len({w for t in toks.values() for w in t})

    expect = {}
    for d, bc in bdt.items():
        n = sum(bc.values())
        s = sum(
            c * math.log((c2[bg] + 1) / (c1[bg[0]] + vocab))
            for bg, c in bc.items()
        )
        expect[d] = (n, round(s / n, 4))

    got = {
        r["doc_id"]: (r["n_bigrams"], round(r["avg_logprob"], 4))
        for r in bigram_logprob_quality(spark, sf_dir).collect()
    }
    assert got == expect
    # order sensitivity: the bigram LM must separate documents more
    # than a constant — scores spread over a real range
    vals = [v[1] for v in got.values()]
    assert max(vals) - min(vals) > 0.1
