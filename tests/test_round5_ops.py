"""Round-5 operator wave: containment dedup, decile budgets, temperature
weights, event seasonality/power-law/session stats, shuffle-balance
estimate, centroid separation, PCA power iteration. Value parity runs
through scripts/oracle_check.py; here: semantics the oracle can't see
(asymmetric-containment behavior, cap firing, numpy cross-check of the
power iteration) plus shape invariants."""

import math

import numpy as np
import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from beametrics_spark.operators.events3 import (
    event_seasonality_profile,
    session_duration_stats,
    user_activity_power_law,
)
from beametrics_spark.operators.profiling2 import (
    N_SHUFFLE_PARTITIONS,
    shuffle_partition_estimate,
)
from beametrics_spark.operators.similarity4 import (
    PCA_ITERS,
    centroid_separation_matrix,
    embedding_pca_power_iteration,
)
from beametrics_spark.operators.text4 import (
    containment_dup_pairs,
    containment_pairs,
    domain_temperature_weights,
    quality_decile_token_budget,
)


# --- text4 -------------------------------------------------------------------


def test_containment_catches_subset_jaccard_misses(spark):
    """A 10-token doc quoted verbatim inside a 40-token doc: containment
    1.0 (all of A's shingles appear in B) while Jaccard is far below the
    0.8 dedup bar — the exact case this operator exists for."""
    from beametrics_spark.operators.dedup import ngram_jaccard_pairs

    inner = " ".join(f"q{i}" for i in range(10))
    outer = " ".join(f"w{i}" for i in range(15)) + " " + inner + " " + " ".join(
        f"z{i}" for i in range(15)
    )
    docs = spark.createDataFrame(
        [(1, inner), (2, outer)], "doc_id long, text string"
    )
    cont = containment_pairs(docs).collect()
    assert len(cont) == 1
    assert cont[0].containment == 1.0
    assert cont[0].contained_doc == 1
    assert ngram_jaccard_pairs(docs).count() == 0  # jaccard ~ 6/36, missed


def test_containment_hot_gram_capped_and_observed(spark):
    docs = spark.createDataFrame(
        [(i, "c1 c2 c3 c4 c5") for i in range(30)], "doc_id long, text string"
    )
    obs = Observation()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert containment_pairs(docs, cap=8, cap_metric=obs).count() == 0
        assert obs.get["n_dropped"] == 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_decile_budget_partitions_corpus(spark, sf_dir):
    rows = quality_decile_token_budget(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert {r["decile"] for r in rows} == set(range(1, 11))
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # deciles are ordered by score descending: min_score non-increasing
    by_decile = sorted(rows, key=lambda r: r["decile"])
    for a, b in zip(by_decile, by_decile[1:]):
        assert a["min_score"] >= b["max_score"] - 1e-9


def test_temperature_weights_flatten_the_mix(spark, sf_dir):
    rows = domain_temperature_weights(spark, sf_dir).collect()
    assert abs(sum(r["w_temp"] for r in rows) - 1.0) < 1e-3
    # alpha < 1 compresses ratios: max/min of w must not exceed that of p
    ps = [r["p_raw"] for r in rows]
    ws = [r["w_temp"] for r in rows]
    assert max(ws) / min(ws) <= max(ps) / min(ps) + 1e-9


# --- events3 -----------------------------------------------------------------


def test_seasonality_ratios_average_to_one(spark, sf_dir):
    rows = event_seasonality_profile(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["load_ratio"])
    for ratios in by_type.values():
        assert abs(sum(ratios) / len(ratios) - 1.0) < 0.01


def test_power_law_buckets_cover_all_users(spark, sf_dir):
    rows = user_activity_power_law(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r["n_users"] for r in rows) == ev.select("user_id").distinct().count()
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert abs(sum(r["event_share"] for r in rows) - 1.0) < 0.01
    share = rows[0]["top1pct_share"]
    assert all(r["top1pct_share"] == share for r in rows)  # scalar repeated
    assert 0.0 < share <= 1.0


def test_session_stats_consistent_with_sessions_per_user(spark, sf_dir):
    from beametrics_spark.operators.relational import sessions_per_user

    stats = session_duration_stats(spark, sf_dir).collect()[0]
    n_sessions = (
        sessions_per_user(spark, sf_dir).agg(F.sum("n_sessions")).collect()[0][0]
    )
    assert stats["n_sessions"] == n_sessions
    assert 0.0 <= stats["bounce_rate"] <= 1.0
    assert stats["avg_duration_s"] <= stats["max_duration_s"]


# --- profiling2 --------------------------------------------------------------


def test_shuffle_estimate_partitions_and_balance(spark, sf_dir):
    rows = shuffle_partition_estimate(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert all(0 <= r["partition_id"] < N_SHUFFLE_PARTITIONS for r in rows)
    assert sum(r["n_rows"] for r in rows) == li.count()
    mean_ratio = sum(r["balance_ratio"] for r in rows) / len(rows)
    assert abs(mean_ratio - 1.0) < 0.05
    for r in rows:
        assert r["max_key_rows"] <= r["n_rows"]


# --- similarity4 -------------------------------------------------------------


def test_centroid_separation_shape(spark, sf_dir):
    rows = centroid_separation_matrix(spark, sf_dir).collect()
    labels = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label")
        .distinct()
        .count()
    )
    assert len(rows) == labels * (labels - 1) // 2
    assert all(-1.0 - 1e-9 <= r["cos_sim"] <= 1.0 + 1e-9 for r in rows)


def test_pca_matches_numpy_power_iteration(spark, sf_dir):
    """The Spark plan must reproduce the SAME 3-step power iteration a
    numpy reference computes from the same parquet — value check of the
    distributed covariance + mat-vec chain, not just shape."""
    rows = embedding_pca_power_iteration(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    x = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / x.shape[0]
    v = np.ones(64) / math.sqrt(64)
    for _ in range(PCA_ITERS):
        w = cov @ v
        v = w / np.linalg.norm(w)
    lam = float(v @ (cov @ v))
    if v.sum() < 0:
        v = -v
    got = {r["dim"]: r["loading"] for r in rows}
    assert len(got) == 64
    for d in range(64):
        assert abs(got[d + 1] - v[d]) < 1e-4, f"dim {d}"
    assert abs(rows[0]["eigenvalue"] - lam) < 1e-4
    # loadings are a unit vector
    assert abs(sum(l * l for l in got.values()) - 1.0) < 1e-3


def test_pca_eigenvalue_dominates_dim_variance(spark, sf_dir):
    """The top-eigenvalue estimate must be at least the largest single
    per-dimension variance (Rayleigh quotient of e_i is a lower bound
    after convergence; 3 iterations from uniform start get there on
    this spectrum)."""
    rows = embedding_pca_power_iteration(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    x = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)
    max_var = float(x.var(axis=0, ddof=0).max())
    assert rows[0]["eigenvalue"] >= max_var * 0.8


# --- multimodal patch pool ---------------------------------------------------


def test_patch_pool_odd_dimension_geometry(spark):
    """5×3 image, 2×2 grid: integer-division boundaries give the
    trailing patches the odd-dimension slack — n_px must be
    {(0,0):2, (0,1):3, (1,0):4, (1,1):6} and cover every pixel."""
    from beametrics_spark.operators.imagecodec import encode_ppm
    from beametrics_spark.operators.multimodal import patch_pool

    px = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    payload = encode_ppm(px)
    media = spark.createDataFrame(
        [(7, "image/ppm", bytearray(payload), len(payload))],
        "doc_id long, media_type string, payload binary, n_bytes long",
    )
    rows = {(r.patch_row, r.patch_col): r for r in patch_pool(media).collect()}
    assert {(k, rows[k].n_px) for k in rows} == {
        ((0, 0), 2), ((0, 1), 3), ((1, 0), 4), ((1, 1), 6)
    }
    assert sum(r.n_px for r in rows.values()) == 15
    # exact sums: patch (0,0) covers pixels (y=0, x=0..1), channels 0..2
    assert rows[(0, 0)].mean_sum == int(px[0:1, 0:2, :].sum())


# --- text5 -------------------------------------------------------------------


def test_zipf_slope_is_negative_power_law(spark, sf_dir):
    from beametrics_spark.operators.text5 import zipf_fit_slope

    row = zipf_fit_slope(spark, sf_dir).collect()[0]
    assert row["n_terms"] > 0
    assert row["zipf_slope"] < 0  # frequency decreases with rank
    assert 0.0 <= row["r2"] <= 1.0


def test_novelty_curve_first_decile_is_all_new(spark, sf_dir):
    from beametrics_spark.operators.text5 import ngram_novelty_curve

    rows = sorted(
        ngram_novelty_curve(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert rows[0]["decile"] == 0
    assert all(0.0 <= r["novelty_rate"] <= 1.0 for r in rows)
    # decile 0 has never seen anything before, so most of its gram
    # occurrences are first-sightings (within-decile repeats keep it <1)
    assert rows[0]["novelty_rate"] > 0.5
    # every distinct gram is counted as new exactly once, somewhere
    from beametrics_spark.operators.dedup import gram_rows
    from beametrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_distinct = gram_rows(docs, 5).select("s").distinct().count()
    assert sum(r["new_grams"] for r in rows) == n_distinct


def test_cross_split_contamination_detects_planted_leak(spark, tmp_path):
    """Plant a verbatim 8-gram shared between a train doc and a test doc
    (split ids chosen by the md5 rule itself) — the audit must flag
    exactly the planted test doc."""
    from beametrics_spark.operators.text5 import cross_split_contamination

    # find ids landing in train/test under the md5 rule
    import hashlib

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100

    train_id = next(i for i in range(1000) if bucket(i) < 90)
    test_id = next(i for i in range(1000) if bucket(i) >= 95)
    other_test = next(
        i for i in range(test_id + 1, 2000) if bucket(i) >= 95
    )
    leak = "l1 l2 l3 l4 l5 l6 l7 l8"
    rows = [
        (train_id, "prefix " + leak + " suffix", "en", "srcA", 1),
        (test_id, leak + " tail tail2", "en", "srcA", 1),
        (other_test, "totally different words here with no overlap at all",
         "en", "srcA", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in cross_split_contamination(
        spark, str(tmp_path)
    ).collect()}
    assert out["srcA"]["n_test_docs"] == 2
    assert out["srcA"]["n_contaminated"] == 1
    assert out["srcA"]["contamination_rate"] == 0.5


# --- graph2 ------------------------------------------------------------------


def test_triangle_census_on_known_graph(spark, tmp_path):
    """Planted graph: orders realize K4 on suppliers {1,2,3,4} (4
    triangles) plus a pendant vertex 5 attached to 1 (no new triangle).
    The backbone keeps everything (degrees < K), so the census must
    count exactly 4 triangles."""
    from beametrics_spark.operators.graph2 import supplier_cotrade_triangles

    rows = []
    ok = 0
    # each pair of {1,2,3,4} co-occurs via its own order => K4
    for i in range(1, 5):
        for j in range(i + 1, 5):
            ok += 1
            rows.append((ok, i))
            rows.append((ok, j))
    ok += 1
    rows.append((ok, 1))
    rows.append((ok, 5))
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = supplier_cotrade_triangles(spark, str(tmp_path)).collect()[0]
    assert out["n_vertices"] == 5
    assert out["n_edges"] == 7  # 6 K4 edges + pendant
    assert out["n_triangles"] == 4
    # open triads: degs = 4,3,3,3,1 -> 6+3+3+3+0 = 15; clustering = 12/15
    assert out["open_triads"] == 15
    assert abs(out["global_clustering"] - 0.8) < 1e-9


def test_triangle_backbone_bounds_degree(spark, sf_dir):
    from beametrics_spark.operators.graph2 import (
        BACKBONE_K,
        supplier_cotrade_triangles,
    )

    out = supplier_cotrade_triangles(spark, sf_dir).collect()[0]
    # symmetrized top-K backbone: every degree <= 2K, so edges <= V*K
    assert out["n_edges"] <= out["n_vertices"] * BACKBONE_K
    assert out["n_triangles"] >= 0
    assert 0.0 <= out["global_clustering"] <= 1.0


def test_forecast_error_gap_safe_lag(spark, tmp_path):
    """A series with a missing hour must still pair each hour with its
    true 24-hours-earlier bucket (a row-order lag would slide into the
    gap). Planted: day-1 hours 0..2 = value 10, day-2 hours {0,2} = 12
    with hour 1 MISSING -> 2 forecast points, both |err| = 2."""
    from datetime import datetime

    from beametrics_spark.operators.events3 import (
        seasonal_naive_forecast_error,
    )

    rows = []
    eid = 0
    for h in (0, 1, 2):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1, h, 30), 1, "view", 10.0, "{}"))
    for h in (0, 2):
        eid += 1
        rows.append((eid, datetime(2024, 1, 2, h, 30), 1, "view", 12.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = seasonal_naive_forecast_error(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 2
    assert r["mae"] == 2.0
    assert r["rmse"] == 2.0


# --- mining ------------------------------------------------------------------


def test_cusum_matches_direct_recursion(spark, sf_dir):
    """The window-algebra CUSUM (C_t - min(0, running-min C)) must equal
    the textbook recursion S_t = max(0, S_{t-1} + step) computed
    directly in Python over the same daily series."""
    from beametrics_spark.operators.mining import (
        CUSUM_H_SIGMA,
        CUSUM_K_SIGMA,
        value_cusum_drift,
    )

    out = {r["event_type"]: r for r in value_cusum_drift(spark, sf_dir).collect()}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    import collections
    import statistics

    daily = collections.defaultdict(list)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())].append(r["value"])
    series = collections.defaultdict(dict)
    for (t, d), vals in daily.items():
        series[t][d] = sum(vals) / len(vals)
    for t, by_day in series.items():
        xs = [by_day[d] for d in sorted(by_day)]
        mu = sum(xs) / len(xs)
        sd = statistics.stdev(xs)
        s = 0.0
        max_s = 0.0
        alarms = 0
        for x in xs:
            s = max(0.0, s + (x - mu) / sd - CUSUM_K_SIGMA)
            max_s = max(max_s, s)
            if s > CUSUM_H_SIGMA:
                alarms += 1
        assert out[t]["n_days"] == len(xs)
        assert abs(out[t]["max_cusum"] - max_s) < 1e-3, t
        assert out[t]["n_alarm_days"] == alarms, t


def test_basket_lift_on_planted_bundle(spark, tmp_path):
    """Parts 1+2 always co-occur (8 orders); parts 3..10 are scattered.
    The bundle must rank first with lift = n_orders/ (8*8) * 8... i.e.
    lift = N * n_ab / (n_a * n_b) = 16*8/64 = 2.0."""
    from beametrics_spark.operators.mining import basket_part_pair_lift

    rows = []
    for ok in range(1, 9):  # bundle orders
        rows += [(ok, 1), (ok, 2)]
    for ok in range(9, 17):  # filler orders with rotating parts
        rows += [(ok, 3 + ok % 4), (ok, 7 + ok % 4)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = basket_part_pair_lift(spark, str(tmp_path)).collect()
    top = out[0]
    assert (top["part_a"], top["part_b"]) == (1, 2)
    assert top["n_ab"] == 8
    assert abs(top["lift"] - 2.0) < 1e-9


def test_rfm_segments_cover_customers(spark, sf_dir):
    from beametrics_spark.operators.mining import rfm_customer_segments

    rows = rfm_customer_segments(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_quartile"] <= 4
        assert 1 <= r["f_quartile"] <= 4
        assert 1 <= r["m_quartile"] <= 4
    # frequency quartile 1 must out-frequent quartile 4 on average
    f1 = [r for r in rows if r["f_quartile"] == 1]
    f4 = [r for r in rows if r["f_quartile"] == 4]
    avg = lambda rs: sum(r["avg_frequency"] * r["n_customers"] for r in rs) / sum(
        r["n_customers"] for r in rs
    )
    assert avg(f1) > avg(f4)


def test_abc_classes_pareto_structure(spark, sf_dir):
    from beametrics_spark.operators.mining import part_revenue_abc_classes

    rows = {r["abc_class"]: r for r in part_revenue_abc_classes(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 0.01
    # Pareto: the A class owns ~80% of revenue with a minority of parts
    assert rows["A"]["revenue_share"] >= 0.78
    total_parts = sum(r["n_parts"] for r in rows.values())
    assert rows["A"]["n_parts"] < total_parts
    assert rows["C"]["revenue_share"] <= 0.06


def test_backlog_sweep_conserves_orders(spark, sf_dir):
    """+1/-1 sweep sanity: the final cumulative backlog is zero (every
    order opens once and closes once), and the peak equals a directly
    computed interval count on a sample month."""
    from beametrics_spark.operators.mining import order_backlog_sweep

    rows = sorted(
        order_backlog_sweep(spark, sf_dir).collect(), key=lambda r: r["month"]
    )
    assert rows[-1]["open_backlog"] == 0
    assert sum(r["net_change"] for r in rows) == 0
    assert max(r["open_backlog"] for r in rows) > 0
    assert all(r["open_backlog"] >= 0 for r in rows)
