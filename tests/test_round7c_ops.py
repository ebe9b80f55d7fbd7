"""Round-7 wave 4: boilerplate block masking, user contribution capping.

Semantics verified against independent pure-Python recomputation over
the raw parquet rows (plain dicts), not against the operators' own
helpers or oracles.
"""

from collections import Counter

from beametrics_spark.operators.curation4 import (
    BOILER_DF_MIN,
    CONTRIB_CAP,
    boilerplate_block_mask,
    user_contribution_capping,
)
from beametrics_spark.operators.dedup2 import PASSAGE_WIDTH
from beametrics_spark.sources import load_table


def test_boilerplate_mask_matches_pure_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].strip().split() for r in docs}

    P = PASSAGE_WIDTH
    blocks = {}  # doc -> list of block texts (non-overlapping)
    for d, t in toks.items():
        blocks[d] = [
            " ".join(t[i : i + P]) for i in range(0, len(t) - P + 1, P)
        ]
    ddf = Counter()
    for d, bs in blocks.items():
        for b in set(bs):
            ddf[b] += 1

    expect = {}
    for d, t in toks.items():
        bs = blocks[d]
        boiler = sum(1 for b in bs if ddf[b] >= BOILER_DF_MIN)
        n = len(t)
        expect[d] = (
            n,
            len(bs),
            boiler,
            n - P * boiler,
            round(P * boiler / n, 4),
        )

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_blocks"],
            r["n_boiler_blocks"],
            r["kept_tokens"],
            round(r["boiler_frac"], 4),
        )
        for r in boilerplate_block_mask(spark, sf_dir).collect()
    }
    assert got == expect
    # non-trivial: the planted near-duplicates make some blocks recur
    assert any(v[2] > 0 for v in got.values())
    # a block repeated only WITHIN one doc must not be boilerplate:
    # every boilerplate doc's masked blocks exist in another doc too
    for d, v in got.items():
        if v[2] > 0:
            assert any(
                ddf[b] >= BOILER_DF_MIN for b in blocks[d]
            )


def test_contribution_capping_matches_pure_python(spark, sf_dir):
    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .collect()
    )
    per = Counter((r["user_id"], r["event_type"]) for r in events)

    by_type = {}
    for (_u, et), c in per.items():
        n_users, n_events, n_kept, over = by_type.get(et, (0, 0, 0, 0))
        by_type[et] = (
            n_users + 1,
            n_events + c,
            n_kept + min(c, CONTRIB_CAP),
            over + (1 if c > CONTRIB_CAP else 0),
        )
    expect = {
        et: v + (round((v[1] - v[2]) / v[1], 4),)
        for et, v in by_type.items()
    }

    got = {
        r["event_type"]: (
            r["n_users"],
            r["n_events"],
            r["n_kept"],
            r["users_over_cap"],
            round(r["drop_rate"], 4),
        )
        for r in user_contribution_capping(spark, sf_dir).collect()
    }
    assert got == expect
    # the cap must actually bite at this SF (avg >13 events per pair)
    assert all(v[3] > 0 for v in got.values())


def test_brown_double_smoothing_matches_pure_python(spark, sf_dir):
    from collections import defaultdict

    from beametrics_spark.operators.timeseries import (
        EWMA_WINDOW,
        brown_double_smoothing_error,
    )

    events = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    hourly = Counter(
        (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        for r in events
    )
    series = defaultdict(list)
    for (et, b), c in sorted(hourly.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        series[et].append(c)

    def fold(vals):
        acc = None
        for v in vals[-EWMA_WINDOW:]:
            acc = float(v) if acc is None else (acc + float(v)) / 2.0
        return acc

    expect = {}
    for et, xs in series.items():
        s1 = [fold(xs[: i + 1]) for i in range(len(xs))]
        errs = []
        for t in range(1, len(xs)):
            f = 2.0 * s1[t - 1] - fold(s1[:t])
            errs.append(abs(xs[t] - f))
        expect[et] = (
            len(errs),
            round(sum(errs) / len(errs), 4),
            round(max(errs), 4),
        )

    got = {
        r["event_type"]: (
            r["n_points"],
            round(r["mae"], 4),
            round(r["max_abs_err"], 4),
        )
        for r in brown_double_smoothing_error(spark, sf_dir).collect()
    }
    assert got == expect
    # the trend-aware forecast must differ from the plain EWMA backtest
    # (otherwise the second smoother is dead code on this data)
    from beametrics_spark.operators.timeseries import ewma_forecast_error

    ewma = {
        r["event_type"]: round(r["mae"], 4)
        for r in ewma_forecast_error(spark, sf_dir).collect()
    }
    assert any(ewma[et] != got[et][1] for et in got)


def test_minhash_audit_matches_pure_python(spark, sf_dir):
    import hashlib
    from itertools import combinations

    from beametrics_spark.operators.dedup import SHINGLE_WIDTH
    from beametrics_spark.operators.dedup3 import (
        AUDIT_MIN_SHARED,
        AUDIT_MINHASH_K,
        minhash_estimate_error_audit,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    shingles = {}
    for r in docs:
        t = r["text"].strip().split()
        shingles[r["doc_id"]] = {
            " ".join(t[i : i + SHINGLE_WIDTH])
            for i in range(len(t) - SHINGLE_WIDTH + 1)
        }

    def sig(grams):
        fps = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        out = []
        for i in range(AUDIT_MINHASH_K):
            t, q = divmod(i, 4)
            lo = 8 * q
            out.append(
                min(
                    hashlib.md5(f"{t}:{fp}".encode()).hexdigest()[lo : lo + 8]
                    for fp in fps
                )
            )
        return out

    sigs = {d: sig(g) for d, g in shingles.items() if g}

    expect = {}
    for a, b in combinations(sorted(shingles), 2):
        c = len(shingles[a] & shingles[b])
        if c < AUDIT_MIN_SHARED:
            continue
        u = len(shingles[a] | shingles[b])
        m = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        K = AUDIT_MINHASH_K
        expect[(a, b)] = (
            c,
            u,
            m,
            int(abs(m * u - K * c) * 8 <= K * u),
            int(abs(m * u - K * c) * 4 <= K * u),
        )

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["inter_grams"],
            r["union_grams"],
            r["sig_matches"],
            r["within_0125"],
            r["within_025"],
        )
        for r in minhash_estimate_error_audit(spark, sf_dir).collect()
    }
    assert got == expect
    # estimator quality: K=64 keeps essentially every pair inside the
    # 0.25 absolute-error band, and the audit must cover real pairs
    assert len(got) > 10
    n25 = sum(v[4] for v in got.values())
    assert n25 == len(got)


def test_knn_label_vote_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.similarity4 import (
        VOTE_K,
        knn_label_vote_audit,
    )

    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return round(num / (na * nb), 6)

    per_label = Counter()
    correct = Counter()
    ids = sorted(vecs)
    for s in ids:
        nb = sorted(
            ((-cos(vecs[s], vecs[d]), d) for d in ids if d != s)
        )[:VOTE_K]
        votes = Counter(labels[d] for _, d in nb)
        pred = min(votes, key=lambda l: (-votes[l], l))
        per_label[labels[s]] += 1
        correct[labels[s]] += int(pred == labels[s])

    expect = {
        l: (
            per_label[l],
            correct[l],
            round(correct[l] / per_label[l], 4),
        )
        for l in per_label
    }
    got = {
        r["label"]: (r["n_vectors"], r["n_correct"], round(r["accuracy"], 4))
        for r in knn_label_vote_audit(spark, sf_dir).collect()
    }
    assert got == expect
    # the synthetic label space must be non-degenerate: some class
    # coherence, not all-zero and not all-perfect
    accs = [v[2] for v in got.values()]
    assert len(got) == 10 and max(accs) > 0
