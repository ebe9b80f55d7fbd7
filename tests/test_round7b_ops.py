"""Round-7 wave 2: BM25 retrieval, label-propagation communities,
EWMA forecast backtest.

Same engine-free strategy as the other rounds' test files: semantics
verified against independent pure-Python recomputation (plain dicts
and floats), not against the operators' own helpers or oracles.
"""

import math

from pyspark.sql import functions as F

from beametrics_spark.operators.graph3 import (
    N_ITER as LPA_ITER,
    TOP_N as LPA_TOP,
    label_prop_communities,
)
from beametrics_spark.operators.retrieval import (
    B,
    K1,
    QUERY_TERMS,
    TOP_K,
    bm25_topk_retrieval,
)
from beametrics_spark.operators.timeseries import (
    EWMA_WINDOW,
    ewma_forecast_error,
)
from beametrics_spark.sources import load_table


def test_bm25_matches_pure_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].strip().split() for r in docs}
    n = len(toks)
    s = sum(len(t) for t in toks.values())
    avgdl = s / n

    # per (query, pos): posting list {doc: tf}
    postings = {}
    for q, p, term in QUERY_TERMS:
        postings[(q, p)] = {
            d: t.count(term) for d, t in toks.items() if term in t
        }

    expect = {}
    for q in sorted({q for q, _, _ in QUERY_TERMS}):
        scores = {}
        for p in (1, 2, 3):
            pl = postings.get((q, p))
            if not pl:
                continue
            df = len(pl)
            idf = (n - df + 0.5) / (df + 0.5)
            for d, tf in pl.items():
                dl = len(toks[d])
                c = idf * (
                    (tf * (K1 + 1))
                    / (tf + K1 * ((1 - B) + B * (dl / avgdl)))
                )
                scores.setdefault(d, [0.0, 0.0, 0.0])[p - 1] = c
        total = {
            d: round((v[0] + v[1]) + v[2], 6) for d, v in scores.items()
        }
        ranked = sorted(total, key=lambda d: (-total[d], d))[:TOP_K]
        for rk, d in enumerate(ranked, 1):
            expect[(q, rk)] = (d, total[d])

    got = {
        (r["query_id"], r["rk"]): (r["doc_id"], r["bm25"])
        for r in bm25_topk_retrieval(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (doc, score) in expect.items():
        gd, gs = got[k]
        assert gd == doc, (k, doc, gd)
        assert math.isclose(gs, score, rel_tol=0, abs_tol=5e-7), (k, score, gs)


def test_bm25_absent_term_scores_zero_slot(spark, sf_dir):
    """Query 4's second slot ('quantum') is absent from the corpus:
    its scores must equal the single-term 'filter' contribution alone,
    i.e. every returned row still has a strictly positive score."""
    rows = (
        bm25_topk_retrieval(spark, sf_dir)
        .filter(F.col("query_id") == 4)
        .collect()
    )
    assert len(rows) == TOP_K
    assert all(r["bm25"] > 0 for r in rows)


def test_label_prop_matches_pure_python(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    cust = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    w = {}
    for r in lineitem:
        ck = cust.get(r["l_orderkey"])
        if ck is None:
            continue
        key = (f"c:{ck}", f"s:{r['l_suppkey']}")
        w[key] = w.get(key, 0) + 1
    edges = {}
    for (c, s), wt in w.items():
        edges.setdefault(c, {})[s] = wt
        edges.setdefault(s, {})[c] = wt

    lab = {v: v for v in edges}
    for _ in range(LPA_ITER):
        new = {}
        for v, nbrs in edges.items():
            tally = {}
            for u, wt in nbrs.items():
                tally[lab[u]] = tally.get(lab[u], 0) + wt
            new[v] = min(tally, key=lambda L: (-tally[L], L))
        lab = new

    sizes = {}
    for L in lab.values():
        sizes[L] = sizes.get(L, 0) + 1
    expect = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:LPA_TOP]

    got = [
        (r["community"], r["n_nodes"])
        for r in label_prop_communities(spark, sf_dir).collect()
    ]
    assert got == expect


def test_ewma_matches_pure_python_exactly(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    hourly = {}
    for r in events:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        hourly[(r["event_type"], b)] = hourly.get((r["event_type"], b), 0) + 1

    series = {}
    for (t, b), x in hourly.items():
        series.setdefault(t, []).append((b, x))
    expect = {}
    for t, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        errs = []
        for i in range(1, len(xs)):
            window = xs[max(i - EWMA_WINDOW, 0) : i]
            s = float(window[0])
            for v in window[1:]:
                s = (s + v) / 2
            errs.append(abs(xs[i] - s))
        expect[t] = (
            len(errs),
            round(sum(errs) / len(errs), 4),
            round(max(errs), 4),
        )

    got = {
        r["event_type"]: (r["n_points"], r["mae"], r["max_abs_err"])
        for r in ewma_forecast_error(spark, sf_dir).collect()
    }
    # dyadic exactness: equality is EXACT, no tolerance needed
    assert got == expect


def _bm25_topk_python(toks):
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for q in sorted({q for q, _, _ in QUERY_TERMS}):
        scores = {}
        for qq, p, term in QUERY_TERMS:
            if qq != q:
                continue
            pl = {d: t.count(term) for d, t in toks.items() if term in t}
            if not pl:
                continue
            df = len(pl)
            idf = (n - df + 0.5) / (df + 0.5)
            for d, tf in pl.items():
                dl = len(toks[d])
                c = idf * (
                    (tf * (K1 + 1))
                    / (tf + K1 * ((1 - B) + B * (dl / avgdl)))
                )
                scores.setdefault(d, [0.0, 0.0, 0.0])[p - 1] = c
        total = {d: round((v[0] + v[1]) + v[2], 6) for d, v in scores.items()}
        out[q] = sorted(total, key=lambda d: (-total[d], d))[:TOP_K]
    return out


def test_rank_fusion_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.retrieval import (
        RRF_K,
        retrieval_rank_fusion,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].strip().split() for r in docs}
    bm = _bm25_topk_python(toks)

    expect = {}
    for q in bm:
        terms = [t for qq, _, t in QUERY_TERMS if qq == q]
        cov_scores = {}
        for d, t in toks.items():
            n_terms = sum(1 for term in set(terms) if term in t)
            if n_terms:
                cov_scores[d] = (n_terms, sum(t.count(term) for term in set(terms)))
        cov = sorted(
            cov_scores, key=lambda d: (-cov_scores[d][0], -cov_scores[d][1], d)
        )[:TOP_K]
        fused = {}
        for r, d in enumerate(bm[q], 1):
            fused[d] = fused.get(d, 0.0) + 1.0 / (RRF_K + r)
        for r, d in enumerate(cov, 1):
            fused[d] = fused.get(d, 0.0) + 1.0 / (RRF_K + r)
        fused = {d: round(s, 6) for d, s in fused.items()}
        ranked = sorted(fused, key=lambda d: (-fused[d], d))[:TOP_K]
        for rk, d in enumerate(ranked, 1):
            expect[(q, rk)] = d

    got = {
        (r["query_id"], r["rk"]): r["doc_id"]
        for r in retrieval_rank_fusion(spark, sf_dir).collect()
    }
    assert got == expect


def test_event_debounce_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.timeseries import (
        DEBOUNCE_GAP_US,
        event_debounce_rate,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    ).collect()
    by_type = {}
    for r in events:
        by_type.setdefault(r["event_type"], []).append(
            (r["ts"], r["event_id"])
        )
    expect = {}
    for t, rows in by_type.items():
        rows.sort()
        kept = 0
        prev = None
        for ts, _eid in rows:
            us = int(ts.timestamp() * 1_000_000)
            # avoid float epoch precision: recompute from components
            import calendar

            us = calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
            if prev is None or us - prev >= DEBOUNCE_GAP_US:
                kept += 1
            prev = us
        expect[t] = (len(rows), kept, round(kept / len(rows), 4))

    got = {
        r["event_type"]: (r["n_events"], r["n_kept"], r["kept_rate"])
        for r in event_debounce_rate(spark, sf_dir).collect()
    }
    assert got == expect


def test_debounce_state_carries_across_micro_batches(spark, tmp_path):
    """Dense 1-second arrivals split across two files fed one per
    trigger: every gap is below the threshold, so ONLY the very first
    event may be kept — but only if the last-seen state survives the
    micro-batch boundary. A state-losing implementation would also
    keep the second file's first event (gap vs nothing)."""
    import os

    import pandas as pd

    from beametrics_spark.streaming.stateful import debounce_stream

    src = tmp_path / "in"
    src.mkdir()
    base = pd.Timestamp("2024-01-01T00:00:00")
    for i, rng in enumerate([range(0, 5), range(5, 10)]):
        pdf = pd.DataFrame(
            {
                "event_type": ["tick"] * len(rng),
                "ts": [base + pd.Timedelta(seconds=s) for s in rng],
                "event_id": list(rng),
            }
        )
        p = str(src / f"{i:02d}.parquet")
        pdf.to_parquet(p, engine="pyarrow", coerce_timestamps="us")
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    inc = debounce_stream(stream, gap_us=5_000_000)
    name = "debounce_state_test"
    q = (
        inc.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    # two micro-batches -> two increment rows for the key
    assert len(rows) == 2, rows
    total_kept = sum(r["n_kept"] for r in rows)
    total_events = sum(r["n_events"] for r in rows)
    assert total_events == 10
    # 1s gaps throughout: only the very first event survives; the
    # second batch's first event must be debounced AGAINST CARRIED STATE
    assert total_kept == 1, rows


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_plan_shape(spark, sf_dir):
    """100 TB pins (round-9 shape): exactly two parquet scans — the
    pruned-postings pass and the N/avgdl stats pass — with NO
    materialization barrier (no checkpointed ExistingRDD scan), every
    dimension join broadcast, no sort-merge join anywhere."""
    # rank_fusion/eval persist the shared matched set; the CacheManager
    # would substitute it into this identical plan fragment and change
    # the node counts — clear it so the pin checks the COLD shape
    spark.catalog.clearCache()
    df = bm25_topk_retrieval(spark, sf_dir)
    plan = _plan_of(df)
    assert plan.count("Scan parquet") == 2, plan
    assert "Scan ExistingRDD" not in plan, plan
    # term-at-a-time scan: no per-token Generate/explode of the corpus
    # and exactly ONE hash exchange (the matched repartition by query)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_label_prop_plan_truncates_lineage(spark, sf_dir):
    """Lineage must not grow with the iteration count. r14 shape: the
    edge table is built ONCE into a persisted cache and every round
    reads InMemoryTableScan — the only parquet scans in the final plan
    are the ones embedded in that single cached relation's build plan
    (the r13 per-round localCheckpoint pin asserted ExistingRDD roots;
    superseded — full plan pins live in tests/test_round14_ops.py)."""
    spark.catalog.clearCache()
    df = label_prop_communities(spark, sf_dir)
    plan = _plan_of(df)
    assert "InMemoryTableScan" in plan, plan
    # every parquet-scan mention sits inside the ONE cached build plan:
    # remove the cached-relation subtree prints and nothing may remain
    import re

    outside = re.split(r"InMemoryRelation", plan)[0]
    assert "Scan parquet" not in outside, outside


def test_ewma_single_scan_and_partial_agg(spark, sf_dir):
    """The corpus collapses in ONE scan + map-side-combined aggregate
    before any window logic; the fold stays a codegen expression (no
    Python UDF nodes)."""
    df = ewma_forecast_error(spark, sf_dir)
    plan = _plan_of(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_compaction_packing_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.timeseries import (
        COMPACT_TARGET_CHARS,
        compaction_bin_packing,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    by_src = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append((r["n_chars"], r["doc_id"]))
    expect = {}
    for src, items in by_src.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        run = 0
        for n_chars, _ in items:
            b = run // COMPACT_TARGET_CHARS
            key = (src, b)
            nd, tc = expect.get(key, (0, 0))
            expect[key] = (nd + 1, tc + n_chars)
            run += n_chars
    expect = {
        k: (nd, tc, round(tc / COMPACT_TARGET_CHARS, 4))
        for k, (nd, tc) in expect.items()
    }

    got = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["total_chars"], r["fill_ratio"])
        for r in compaction_bin_packing(spark, sf_dir).collect()
    }
    assert got == expect
    # every bin except possibly each source's last is filled past target
    for src, items in by_src.items():
        last_bin = max(b for (s2, b) in got if s2 == src)
        for (s2, b), (_, tc, _) in got.items():
            if s2 == src and b < last_bin:
                assert tc + max(n for n, _ in items) >= COMPACT_TARGET_CHARS


def test_phrase_search_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.retrieval import (
        PHRASE_TERMS,
        phrase_search_topk,
    )

    # the one-join-one-agg vote formulation requires phrases without
    # repeated terms (count(*) votes == count(distinct pip))
    for q in {q for q, _, _ in PHRASE_TERMS}:
        terms = [t for qq, _, t in PHRASE_TERMS if qq == q]
        assert len(terms) == len(set(terms)), terms

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].strip().split() for r in docs}
    phrases = {}
    for q, p, t in PHRASE_TERMS:
        phrases.setdefault(q, []).append((p, t))
    expect = {}
    for q, pts in phrases.items():
        terms = [t for _, t in sorted(pts)]
        L = len(terms)
        counts = {}
        for d, tk in toks.items():
            n = sum(
                1
                for i in range(len(tk) - L + 1)
                if tk[i : i + L] == terms
            )
            if n:
                counts[d] = n
        ranked = sorted(counts, key=lambda d: (-counts[d], d))[:10]
        for rk, d in enumerate(ranked, 1):
            expect[(q, rk)] = (d, counts[d])

    got = {
        (r["query_id"], r["rk"]): (r["doc_id"], r["n_occurrences"])
        for r in phrase_search_topk(spark, sf_dir).collect()
    }
    assert got == expect


def test_kcore_matches_pure_python(spark, sf_dir):
    from beametrics_spark.operators.graph3 import (
        KCORE_K,
        KCORE_ROUNDS,
        kcore_trade_graph,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    cust = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    adj = {}
    for r in lineitem:
        ck = cust.get(r["l_orderkey"])
        if ck is None:
            continue
        c, s = f"c:{ck}", f"s:{r['l_suppkey']}"
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)

    expect = {}
    survivors = set(adj)
    for i in range(1, KCORE_ROUNDS + 1):
        keep = {
            v
            for v in survivors
            if len(adj[v] & survivors) >= KCORE_K
        }
        removed = survivors - keep
        for sd in ("c", "s"):
            expect[(i, sd)] = sum(1 for v in removed if v.startswith(sd))
        survivors = keep
    for sd in ("c", "s"):
        expect[(KCORE_ROUNDS + 1, sd)] = sum(
            1 for v in survivors if v.startswith(sd)
        )

    got = {
        (r["round"], r["side"]): r["n_nodes"]
        for r in kcore_trade_graph(spark, sf_dir).collect()
    }
    assert got == expect


def test_seasonal_anomalies_match_pure_python(spark, sf_dir):
    from beametrics_spark.operators.timeseries import (
        ANOM_TOP,
        seasonal_adjusted_anomalies,
    )

    events = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    hourly = {}
    for r in events:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        hourly[(r["event_type"], b)] = hourly.get((r["event_type"], b), 0) + 1

    seas = {}
    for (t, b), x in hourly.items():
        key = (t, b.hour)
        s, n = seas.get(key, (0, 0))
        seas[key] = (s + x, n + 1)
    expect = {}
    for t in {t for t, _ in hourly}:
        rows = []
        for (t2, b), x in hourly.items():
            if t2 != t:
                continue
            s, n = seas[(t, b.hour)]
            resid = x - (s * 1.0 / n)
            rows.append((abs(resid), b, x, resid))
        rows.sort(key=lambda r: (-r[0], r[1]))
        for rk, (_, b, x, resid) in enumerate(rows[:ANOM_TOP], 1):
            expect[(t, rk)] = (b, x, round(resid, 4))

    got = {}
    rk_ct = {}
    for r in seasonal_adjusted_anomalies(spark, sf_dir).collect():
        rk_ct[r["event_type"]] = rk_ct.get(r["event_type"], 0) + 1
    # re-collect with deterministic rank reconstruction
    rows = seasonal_adjusted_anomalies(spark, sf_dir).collect()
    per_type = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(
            (abs(r["residual"]), r["bucket"], r["x"], r["residual"])
        )
    for t, rs in per_type.items():
        rs.sort(key=lambda v: (-v[0], v[1]))
        for rk, (_, b, x, resid) in enumerate(rs, 1):
            got[(t, rk)] = (b, x, resid)
    assert got == expect


def test_stream_weighted_sample_matches_batch_twin(spark, sf_dir):
    """A-ES keys make the reservoir exactly mergeable, so the 4-epoch
    streaming reservoir must equal the batch sample row for row."""
    from beametrics_spark.operators.sampling import weighted_sample_wor
    from beametrics_spark.operators.stream_parity import (
        stream_weighted_sample_parity,
    )

    batch = sorted(tuple(r) for r in weighted_sample_wor(spark, sf_dir).collect())
    stream = sorted(
        tuple(r) for r in stream_weighted_sample_parity(spark, sf_dir).collect()
    )
    assert batch == stream


def test_apportionment_matches_pure_python_and_sums_to_budget(spark, sf_dir):
    from beametrics_spark.operators.sampling import (
        APPORTION_BUDGET,
        budget_apportion_largest_remainder,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    wt = {}
    for r in docs:
        wt[r["source"]] = wt.get(r["source"], 0) + r["n_chars"]
    tw = sum(wt.values())
    base = {s: (APPORTION_BUDGET * w) // tw for s, w in wt.items()}
    rem = {s: (APPORTION_BUDGET * w) % tw for s, w in wt.items()}
    leftover = APPORTION_BUDGET - sum(base.values())
    order = sorted(wt, key=lambda s: (-rem[s], s))
    expect = {
        s: (wt[s], base[s] + (1 if i < leftover else 0))
        for i, s in enumerate(order)
    }

    got = {
        r["source"]: (r["weight"], r["alloc"])
        for r in budget_apportion_largest_remainder(spark, sf_dir).collect()
    }
    assert got == expect
    assert sum(a for _, a in got.values()) == APPORTION_BUDGET
