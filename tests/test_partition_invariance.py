"""Partition-count invariance: the driver's value-hash compares Spark
output against DuckDB after rounding floats to 6 decimals, so any
query whose values depend on parallel summation ORDER would flake
between machines/partitionings — the exact failure class behind past
hash-mismatch hunts (sessions_per_user r1, sequence_packing r3).

Each risky query (double aggregation + rounding, rational TF-IDF,
decimal-exact revenue, percentile cuts) runs under two different
shuffle-partition settings; canonical outputs must be IDENTICAL, not
just close.
"""

import pytest

RISKY = [
    "revenue_by_nation",          # decimal-exact by design
    "tfidf_top_terms",            # rational IDF determinism claim
    "text_quality_scores",        # double ratios + round
    "sequence_packing",           # windowed cumsum buckets
    "sessions_per_user",          # the round-1 normalization case
    "central_tendency_per_type",  # sort-derived percentile claim
    "value_clip_rates",           # percentile cuts + rate doubles
    # round-4 wave 2: every entry whose values involve parallel double
    # reduction (log sums, entropy, stddev, robust z) or percentile cuts
    "unigram_logprob_quality",    # count-weighted ln sums
    "token_entropy_per_doc",      # c*log2(c) sums
    "doc_length_outlier_flags",   # exact-percentile cut membership
    "embedding_dim_stats",        # stddev_samp merge order
    "embedding_norm_outliers",    # rounded-z boundary membership
    "daily_anomaly_mad",          # median/MAD cuts + robust z
    "ohlc_downsample",            # min_by/max_by merge over struct order
    "event_interval_overlap_sweep",  # windowed cumsum peak
    "vocab_growth_curve",         # decile bucketing + cumsum
    # round-5 wave: every new entry whose values involve parallel double
    # reduction (regression sums, iterated mat-vecs, pow sums) or
    # ranking on rounded doubles
    "zipf_fit_slope",             # centered regression sums + r2
    "embedding_pca_power_iteration",  # iterated covariance mat-vecs
    "domain_temperature_weights", # pow(p, alpha) normalizer sum
    "quality_decile_token_budget",  # ntile over rounded-score ordering
    "centroid_separation_matrix",  # centroid avg merge order
    "event_seasonality_profile",  # per-type hourly mean ratios
    "session_duration_stats",     # avg duration doubles
    "seasonal_naive_forecast_error",  # MAE/RMSE double reductions
    "value_cusum_drift",          # running-sum windows over std-normalized steps
    "rfm_customer_segments",      # ntile cuts + avg doubles
    # round-5 wave e: credit-split double sums, global running-max
    # window over the arrival order, merged partials vs direct
    "multi_touch_attribution",    # sum(1/n) + sum(value/n) doubles
    "watermark_lateness_audit",   # global-order running max + delay sums
    "incremental_aggregate_merge",  # partial-merge must not see order
    "basket_part_pair_lift",      # lift ranking on rounded doubles
    "weighted_median_price_per_flag",  # cumulative-weight window cut
    "equi_depth_histogram_totalprice",  # ntile over a global total order
    "shipping_lag_quantiles",     # sort-based exact percentiles
    # round-6 wave 2: double-key rankings (per-row folds, but the
    # selection boundary must not move with partitioning)
    "weighted_sample_wor",        # ln(u)/w top-k boundary
    "semdedup_prune_list",        # cosine argmax assignment + tau cut
    # round-7 wave 4: double error sums over window folds / rounded-
    # cosine rankings
    "brown_double_smoothing_error",  # |x − f| double sums + round(4)
    "knn_label_vote_audit",       # rounded-cosine neighbor ranking
    # round-7 wave 5: double reductions behind round(4)
    "embedding_truncation_fidelity",  # avg of per-row energy fractions
    "bigram_logprob_quality",     # count-weighted ln sums
]


def _canon(df):
    cols = sorted(df.columns)
    out = []
    for row in df.collect():
        d = row.asDict(recursive=True)
        out.append(
            tuple(
                round(v, 6) if isinstance(v, float) else str(v)
                for v in (d[c] for c in cols)
            )
        )
    return sorted(out)


@pytest.mark.parametrize("name", RISKY)
def test_partition_count_invariance(spark, sf_dir, name):
    import __spark_entry__ as entry

    q = entry.queries()[name]
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _canon(q(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _canon(q(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b
