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


def test_quality_keep_list_matches_pure_python(spark, sf_dir):
    """Cluster membership from exact Jaccard + union-find in plain
    Python; keeper = (max n_chars, min doc_id) per cluster."""
    from beametrics_spark.operators.curation4 import quality_aware_keep_list
    from beametrics_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        SHINGLE_WIDTH,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    )
    sh = {}
    nch = {}
    for r in rows:
        t = r["text"].strip().split()
        sh[r["doc_id"]] = {
            " ".join(t[i : i + SHINGLE_WIDTH])
            for i in range(len(t) - SHINGLE_WIDTH + 1)
        }
        nch[r["doc_id"]] = r["n_chars"]

    parent = {d: d for d in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            union = len(sh[a] | sh[b])
            if inter / union >= JACCARD_THRESHOLD:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    clusters = defaultdict(list)
    for d in ids:
        r = find(d)
        clusters[r].append(d)
    expect = {}
    for root, members in clusters.items():
        if len(members) < 2:
            continue
        keep = min(members, key=lambda d: (-nch[d], d))
        for d in members:
            expect[d] = (root, nch[d], "keep" if d == keep else "drop", keep)

    got = {
        r["doc_id"]: (
            r["cluster_root"],
            r["n_chars"],
            r["decision"],
            r["keep_id"],
        )
        for r in quality_aware_keep_list(spark, sf_dir).collect()
    }
    assert got == expect
    # the quality policy must actually differ from min-id somewhere
    assert any(
        v[3] != v[0] for v in got.values()
    ), "keep-the-longest never disagreed with keep-min-id on this corpus"


def test_bm25_eval_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.retrieval import (
        B,
        K1,
        QUERY_TERMS,
        REL_MIN_TF,
        TOP_K,
        bm25_eval_mrr,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].strip().split() for r in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n

    queries = sorted({q for q, _, _ in QUERY_TERMS})
    expect = {}
    for q in queries:
        terms = [(p, t) for qq, p, t in QUERY_TERMS if qq == q]
        postings = {
            p: {d: tt.count(t) for d, tt in toks.items() if t in tt}
            for p, t in terms
        }
        postings = {p: pl for p, pl in postings.items() if pl}
        scores = {}
        for p, pl in postings.items():
            df = len(pl)
            idf = (n - df + 0.5) / (df + 0.5)
            for d, tf in pl.items():
                dl = len(toks[d])
                c = idf * (
                    (tf * (K1 + 1))
                    / (tf + K1 * ((1 - B) + B * (dl / avgdl)))
                )
                slots = scores.setdefault(d, {})
                slots[p] = max(slots.get(p, 0.0), c)
        total = {
            d: round((s.get(1, 0.0) + s.get(2, 0.0)) + s.get(3, 0.0), 6)
            for d, s in scores.items()
        }
        ranked = sorted(total, key=lambda d: (-total[d], d))
        rank_of = {d: i + 1 for i, d in enumerate(ranked)}
        rel = [
            d
            for d in toks
            if all(
                d in pl and pl[d] >= REL_MIN_TF for pl in postings.values()
            )
        ]
        if rel:
            expect[q] = (
                len(rel),
                min(rank_of[d] for d in rel),
                sum(1 for d in rel if rank_of[d] <= TOP_K),
            )

    got = {
        r["query_id"]: (r["n_relevant"], r["first_rel_rank"], r["hits_at_10"])
        for r in bm25_eval_mrr(spark, sf_dir).collect()
    }
    assert got == expect
    # discriminative ground truth: not every query saturates hits@10
    assert any(v[2] < TOP_K for v in got.values())


def test_stream_boilerplate_mask_matches_batch(spark, sf_dir):
    from beametrics_spark.operators.curation4 import boilerplate_block_mask
    from beametrics_spark.operators.stream_parity import (
        stream_boilerplate_mask_parity,
    )

    def canon(df):
        return sorted(
            (
                r["doc_id"],
                r["n_tokens"],
                r["n_blocks"],
                r["n_boiler_blocks"],
                r["kept_tokens"],
                round(r["boiler_frac"], 4),
            )
            for r in df.collect()
        )

    got = canon(stream_boilerplate_mask_parity(spark, sf_dir))
    want = canon(boilerplate_block_mask(spark, sf_dir))
    assert got == want
    assert len(got) == 500


def test_k_anonymity_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.curation4 import (
        K_ANON_LEVELS,
        K_ANON_VALUE_BUCKET,
        k_anonymity_audit,
    )

    events = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    import math as _math

    groups = Counter(
        (
            r["event_type"],
            r["ts"].hour,
            r["ts"].isoweekday() % 7 + 1,  # Spark dayofweek: Sunday=1
            _math.floor(r["value"] / K_ANON_VALUE_BUCKET),
        )
        for r in events
    )
    total = sum(groups.values())
    expect = {}
    for k in K_ANON_LEVELS:
        below = [n for n in groups.values() if n < k]
        expect[k] = (
            len(groups),
            len(below),
            sum(below),
            round(sum(below) / total, 4),
        )

    got = {
        r["k"]: (
            r["n_groups"],
            r["groups_below_k"],
            r["rows_at_risk"],
            round(r["risk_rate"], 4),
        )
        for r in k_anonymity_audit(spark, sf_dir).collect()
    }
    assert got == expect
    # the audit must find real risk AND real safety at this SF (at
    # k=25 every sf0.01 group is below threshold - that row is the
    # all-at-risk boundary case, checked by equality above)
    assert got[2][1] > 0 and got[2][3] < 1.0


def test_curation_pipeline_v2_consistent_with_stage_operators(spark, sf_dir):
    """v2 is the composition of two already pure-Python-verified
    operators — check it agrees with them stage by stage."""
    from beametrics_spark.operators.curation4 import (
        BOILER_DROP_DEN,
        BOILER_DROP_NUM,
        boilerplate_block_mask,
        curation_pipeline_v2,
        quality_aware_keep_list,
    )
    from beametrics_spark.operators.dedup2 import PASSAGE_WIDTH as P

    mask = {
        r["doc_id"]: (r["n_tokens"], r["n_boiler_blocks"], r["kept_tokens"])
        for r in boilerplate_block_mask(spark, sf_dir).collect()
    }
    losers = {
        r["doc_id"]
        for r in quality_aware_keep_list(spark, sf_dir).collect()
        if r["decision"] == "drop"
    }
    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }

    expect = {}
    for d, (n_tok, n_boiler, kept) in mask.items():
        s = src[d]
        nd, nb, nf, kt = expect.get(s, (0, 0, 0, 0))
        pass_boiler = BOILER_DROP_DEN * P * n_boiler <= BOILER_DROP_NUM * n_tok
        final = pass_boiler and d not in losers
        expect[s] = (
            nd + 1,
            nb + int(pass_boiler),
            nf + int(final),
            kt + (kept if final else 0),
        )

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_after_boiler"],
            r["n_final"],
            r["kept_tokens_total"],
        )
        for r in curation_pipeline_v2(spark, sf_dir).collect()
    }
    assert got == expect
    # every stage must bite somewhere
    assert any(v[0] > v[1] for v in got.values()), "boiler stage inert"
    assert any(v[1] > v[2] for v in got.values()), "dedup stage inert"


def test_stream_k_anonymity_matches_batch(spark, sf_dir):
    from beametrics_spark.operators.curation4 import k_anonymity_audit
    from beametrics_spark.operators.stream_parity import (
        stream_k_anonymity_parity,
    )

    def canon(df):
        return sorted(
            (
                r["k"],
                r["n_groups"],
                r["groups_below_k"],
                r["rows_at_risk"],
                round(r["risk_rate"], 4),
            )
            for r in df.collect()
        )

    assert canon(stream_k_anonymity_parity(spark, sf_dir)) == canon(
        k_anonymity_audit(spark, sf_dir)
    )


def test_avi_codec_roundtrip_and_corruption():
    import struct

    from beametrics_spark.operators.videocodec import (
        decode_avi_index,
        encode_avi,
        fixture_frame_plan,
    )

    for doc_id in (0, 1, 7, 123, 4999):
        payload = encode_avi(doc_id)
        assert decode_avi_index(payload) == fixture_frame_plan(doc_id)

    # structural violations must raise, not guess
    good = encode_avi(42)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_avi_index(good[:-4])  # truncated
    with _pytest.raises(ValueError):
        decode_avi_index(b"RIFF" + good[4:8] + b"WAVE" + good[12:])
    # a LYING index: flip one idx1 size field -> cross-check must catch
    idx_pos = good.rfind(b"idx1")
    size_off = idx_pos + 8 + 12  # first entry's size field
    (orig,) = struct.unpack_from("<I", good, size_off)
    bad = bytearray(good)
    struct.pack_into("<I", bad, size_off, orig + 2)
    with _pytest.raises(ValueError):
        decode_avi_index(bytes(bad))


def test_avi_frame_index_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.multimodal import (
        multimodal_avi_frame_index,
    )
    from beametrics_spark.operators.videocodec import fixture_frame_plan

    doc_ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    expect = {}
    for d in doc_ids:
        plan = fixture_frame_plan(d)
        sizes = [s for s, _ in plan]
        keys = [i for i, (_s, k) in enumerate(plan) if k]
        gaps = [b - a for a, b in zip(keys, keys[1:])]
        expect[d] = (len(plan), len(keys), sum(sizes), max(sizes), max(gaps))

    got = {
        r["doc_id"]: (
            r["n_frames"],
            r["n_keyframes"],
            r["total_frame_bytes"],
            r["max_frame_bytes"],
            r["max_key_gap"],
        )
        for r in multimodal_avi_frame_index(spark, sf_dir).collect()
    }
    assert got == expect


def test_stream_avi_ingest_matches_batch(spark, sf_dir):
    from beametrics_spark.operators.multimodal import (
        multimodal_avi_frame_index,
    )
    from beametrics_spark.operators.stream_parity import (
        stream_avi_ingest_parity,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(stream_avi_ingest_parity(spark, sf_dir)) == canon(
        multimodal_avi_frame_index(spark, sf_dir)
    )


def test_cdc_merge_matches_pure_python(spark, sf_dir):
    import hashlib

    from beametrics_spark.operators.curation3 import (
        CDC_INSERTS,
        cdc_upsert_merge_audit,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    max_id = max(r["doc_id"] for r in rows)

    def h40(text):
        return int(hashlib.md5(text.encode()).hexdigest()[:10], 16)

    stats = {}

    def bump(src, **kw):
        d = stats.setdefault(
            src,
            dict(
                n_base=0, n_deleted=0, n_updated=0, n_inserted=0,
                n_final=0, content_checksum=0,
            ),
        )
        for k, v in kw.items():
            d[k] += v

    for r in rows:
        d, s, t = r["doc_id"], r["source"], r["text"]
        bump(s, n_base=1)
        if d % 13 == 0:
            bump(s, n_deleted=1)
        elif d % 7 == 0:
            bump(s, n_updated=1, n_final=1, content_checksum=h40(t + " v2"))
        else:
            bump(s, n_final=1, content_checksum=h40(t))
    for i in range(1, CDC_INSERTS + 1):
        did = max_id + i
        s = f"src{did % 20}"
        bump(s, n_inserted=1, n_final=1,
             content_checksum=h40(f"inserted doc {did}"))

    got = {
        r["source"]: (
            r["n_base"], r["n_deleted"], r["n_updated"],
            r["n_inserted"], r["n_final"], r["content_checksum"],
        )
        for r in cdc_upsert_merge_audit(spark, sf_dir).collect()
    }
    expect = {
        s: (
            d["n_base"], d["n_deleted"], d["n_updated"],
            d["n_inserted"], d["n_final"], d["content_checksum"],
        )
        for s, d in stats.items()
    }
    assert got == expect
    # every CDC verb must fire at this SF
    tot = [sum(v[i] for v in got.values()) for i in range(6)]
    assert tot[1] > 0 and tot[2] > 0 and tot[3] == CDC_INSERTS


def test_bpe_merge_apply_matches_pure_python(spark, sf_dir):
    import math as _math

    from beametrics_spark.operators.text7 import (
        MERGES,
        bpe_merge_apply_compression,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    expect = {}
    saved_total = 0
    for r in docs:
        t = " " + r["text"].strip() + " "
        for a, b in MERGES:
            t = t.replace(f" {a} {b} ", f" {a}_{b} ")
        before = len(r["text"].strip().split())
        after = len(t.strip().split())
        saved_total += before - after
        # SQL round() is half-up; Python round() is banker's (1/32 =
        # .03125 rounds differently) — mirror half-up explicitly
        frac = _math.floor((before - after) / before * 10000 + 0.5) / 10000
        expect[r["doc_id"]] = (before, after, before - after, frac)

    got = {
        r["doc_id"]: (
            r["n_before"],
            r["n_after"],
            r["n_merged"],
            round(r["compression"], 4),
        )
        for r in bpe_merge_apply_compression(spark, sf_dir).collect()
    }
    assert got == expect
    # the frozen merge list must actually compress this corpus
    assert saved_total > 50
