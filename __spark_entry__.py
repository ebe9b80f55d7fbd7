"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Driver may hand us a vanilla session — apply the engine's settings."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-metric fan-out through
    the engine pipeline (filter → fan-out → tumbling window → count/sum)."""
    from beametrics_spark.queries import ref_multi_metric_fanout

    return ref_multi_metric_fanout(_configure(spark), "/root/testdata/sf0.001")


# Queries with a green driver CORRECTNESS row in a previous round
# (CORRECTNESS_r01.json and CORRECTNESS_r02.json both cover exactly this
# set — the driver checks a bounded prefix of queries()).  Listing them
# lets queries() order not-yet-certified entries first, so cumulative
# driver coverage across rounds reaches the whole registry; every entry
# (certified or not) still runs in the local full-registry gate
# (scripts/oracle_check.py).
DRIVER_CERTIFIED: frozenset[str] = frozenset(
    {
        "ref_equals_count", "ref_contains_count", "ref_numeric_range_count",
        "ref_multi_condition_count", "ref_windowed_sum", "ref_grouped_labels",
        "ref_multi_metric_fanout", "ref_missing_field_sum", "ref_match_all_count",
        "ref_json_field_count", "tpch_q1_pricing_summary", "revenue_by_nation",
        "top_orders_by_price", "topk_orders_per_priority", "rollup_lineitem_qty",
        "cube_order_counts", "distinct_parts_per_flag", "customers_with_orders_semi",
        "customers_without_orders_anti", "set_intersect_building_buyers",
        "set_except_nonbuyers", "running_order_totals", "pivot_user_event_values",
        "sessions_per_user", "asof_last_click_before_purchase",
        "value_quantiles_exact_per_type", "full_outer_join_order_counts",
        "grouping_sets_revenue", "sliding_window_counts", "scalar_function_showcase",
        "exists_subquery_big_spenders", "ranking_variants", "json_props_analysis",
        "conditional_aggregation", "range_join_purchases_after_order",
        "tpch_q3_shipping_priority", "stat_aggregates_per_flag",
        "date_function_rollup", "in_subquery_order_status",
        "correlated_scalar_price_ratio", "moving_avg_time_range",
        "embedding_vector_norms", "value_histogram_per_type",
        "token_frequencies_top100", "tpch_q4_order_priority",
        "tpch_q5_local_supplier", "tpch_q6_forecast_revenue",
        "tpch_q10_returned_items",
        # --- round 3 (CORRECTNESS_r03.json): 49 green rows appended; the
        # one red row (sequence_packing, hash-only mismatch from an uncast
        # DuckDB HUGEINT seq_id in its oracle) is deliberately OMITTED so
        # it re-enters the round-4 prefix for recertification.
        "stream_equals_count_parity", "stream_sliding_window_parity",
        "stream_session_window_parity", "stream_dedup_exact_parity",
        "stream_join_click_purchase_parity", "stream_static_enrich_parity",
        "stream_multi_metric_fanout_parity", "ref_sliding_window_count",
        "ref_session_window_sum", "timeseries_gap_fill",
        "timeseries_fill_forward", "hierarchical_time_rollup",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_simhash_pairs", "dedup_embedding_cosine",
        "dedup_edit_distance_pairs", "dedup_incremental_batch",
        "dedup_clusters", "sample_stratified_hash", "redact_terms",
        "pii_detection_rates", "contamination_ngram_overlap",
        "domain_rebalance_sample", "multimodal_byte_stats",
        "multimodal_frame_sample", "multimodal_bmp_ppm_decode",
        "funnel_conversion", "dataset_split_assign", "text_token_stats",
        "text_quality_scores", "doc_fingerprints", "doc_rolling_fingerprint",
        "curation_pipeline", "quality_repetition_signals",
        "corpus_duplicate_ngram_fraction", "quality_filter_pass_rates",
        "tfidf_top_terms", "tpch_q2_min_cost_supplier",
        "tpch_q9_product_type_profit", "tpch_q11_important_stock",
        "tpch_q16_supplier_part_counts", "tpch_q20_potential_part_promotion",
        "tpch_q14_promo_effect", "tpch_q18_large_volume",
        "tpch_q7_volume_shipping", "tpch_q8_market_share",
        "unpivot_lineitem_measures",
        # --- round 4 (CORRECTNESS_r04.json): 47 green rows appended via
        # scripts/update_certified.py. The one red row
        # (embedding_quantize_int8 — ARRAY<int> output crashed the
        # driver's canonicalizer; now emits a CSV string) is OMITTED so
        # it re-enters the round-5 prefix. (Rows-only entries that
        # recorded their no_oracle row now live in ROWS_RECORDED below —
        # ADVICE r6 #2.)
        "ann_cosine_topk_bruteforce", "bigram_pmi_top",
        "central_tendency_per_type", "corpus_dedup_keep_list",
        "daily_anomaly_mad", "dataset_shard_assign",
        "doc_length_outlier_flags", "embedding_centroid_assign",
        "embedding_centroids_per_label", "embedding_dim_stats",
        "embedding_norm_outliers", "embedding_quantization_error",
        "embedding_whitened_norms", "event_interval_overlap_sweep",
        "event_path_trigrams", "event_transition_matrix",
        "event_type_drift_psi", "first_last_order_per_customer",
        "join_cardinality_estimate", "key_skew_profile",
        "knn_graph_hub_stats", "multimodal_wav_frame_rms",
        "ohlc_downsample", "order_gap_lead_lag",
        "pagerank_customer_supplier", "quality_rule_breakdown",
        "referential_integrity_audit", "sequence_packing",
        "source_crossover_dup_rate", "stream_incremental_dedup_parity",
        "stream_ohlc_parity", "table_profile_orders",
        "template_prefix_clusters", "token_entropy_per_doc",
        "tpch_q12_ship_priority_classes", "tpch_q13_customer_distribution",
        "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
        "tpch_q19_discounted_revenue", "tpch_q21_suppliers_kept_waiting",
        "tpch_q22_global_sales_opportunity", "unigram_logprob_quality",
        "user_retention_cohorts", "value_clip_rates",
        "value_trend_per_type", "vocab_growth_curve",
        "vocab_p90_coverage",
        # --- round 5 (CORRECTNESS_r05.json): 48 green rows appended via
        # scripts/update_certified.py (rows-only entries → ROWS_RECORDED).
        "basket_part_pair_lift", "bpe_merge_candidates",
        "centroid_separation_matrix", "containment_dup_pairs",
        "cross_split_contamination", "doc_chunking_plan",
        "domain_temperature_weights", "embedding_pca_power_iteration",
        "embedding_quantize_int8", "equi_depth_histogram_totalprice",
        "event_seasonality_profile", "incremental_aggregate_merge",
        "multi_touch_attribution", "multimodal_image_patch_pool",
        "ngram_novelty_curve", "order_backlog_sweep",
        "part_revenue_abc_classes", "quality_decile_token_budget",
        "rfm_customer_segments", "seasonal_naive_forecast_error",
        "session_duration_stats", "shipping_lag_quantiles",
        "shuffle_partition_estimate", "snapshot_diff_documents",
        "stream_funnel_parity", "supplier_cotrade_triangles",
        "user_activity_power_law", "value_cusum_drift",
        "watermark_lateness_audit", "weighted_median_price_per_flag",
        "zipf_fit_slope",
        # --- round 6 (CORRECTNESS_r06.json): 48 green rows (13 new names +
        # 35 rotation re-greens) via scripts/update_certified.py.
        "ann_ivf_recall_audit", "approx_distinct_error_audit",
        "approx_quantile_error_audit", "bloom_prefilter_semi_revenue",
        "countmin_error_audit", "dedup_substring_runs",
        "heavy_hitters_exact_twopass", "passage_dedup_rate",
        "semdedup_prune_list", "stream_salted_fanout_parity",
        "stream_topk_per_window_parity", "weighted_sample_wor",
        "zorder_layout_pruning_audit",
        # --- round 7 (CORRECTNESS_r07.json): 50/50 green via
        # scripts/update_certified.py — the first fully clean round.
        "bigram_logprob_quality", "bm25_eval_mrr", "bm25_topk_retrieval",
        "boilerplate_block_mask", "bpe_merge_apply_compression",
        "brown_double_smoothing_error",
        "budget_apportion_largest_remainder", "cdc_upsert_merge_audit",
        "compaction_bin_packing", "curation_pipeline_v2",
        "embedding_truncation_fidelity", "event_debounce_rate",
        "ewma_forecast_error", "k_anonymity_audit", "kcore_trade_graph",
        "knn_label_vote_audit", "label_prop_communities",
        "lang_id_agreement_audit", "minhash_estimate_error_audit",
        "multimodal_avi_frame_index", "phrase_search_topk",
        "quality_aware_keep_list", "retrieval_rank_fusion",
        "seasonal_adjusted_anomalies", "stream_avi_ingest_parity",
        "stream_boilerplate_mask_parity", "stream_cdc_merge_parity",
        "stream_contribution_cap_parity",
        "stream_debounce_parity", "stream_ewma_parity",
        "stream_k_anonymity_parity", "stream_passage_dedup_parity",
        "stream_weighted_sample_parity", "user_contribution_capping",
        # --- round 9 (CORRECTNESS_r09.json): 50/50 green, third clean
        # round; one new name.
        "cdc_merge_on_read_audit",
        # --- round 10 (CORRECTNESS_r10.json): 50/50 green, fourth clean
        # round; two new names.
        "cdc_mor_compaction_audit", "stream_cdc_mor_parity",
        # --- round 11 (CORRECTNESS_r11.json): 49/50 hash-green (the
        # 50th is the rows-only-by-design ann_cosine_topk_lsh); one new
        # name.
        "value_percentiles_exact_global",
    }
)

# Rows-only queries (no oracle_sql entry — approximate by design) whose
# weaker no_oracle driver row HAS been recorded in some round's
# CORRECTNESS artifact. Kept OUT of DRIVER_CERTIFIED (ADVICE r6 #2:
# "certified" must mean hash-green, not rows-only-recorded); each has a
# hash-checkable audit sibling certifying the machinery
# (ann_ivf_recall_audit, approx_distinct_error_audit,
# approx_quantile_error_audit, lang_id_agreement_audit). They sort LAST
# in queries() — re-running the weaker check is the worst use of the
# driver's bounded prefix.
ROWS_RECORDED: frozenset[str] = frozenset(
    {
        "approx_distinct_users_per_type",  # r1
        "value_quantiles_per_type",  # r1
        "lang_id_heuristic",  # r4, r6
        "ann_cosine_topk_lsh",  # r4
        "ann_cosine_topk_ivf",  # r5
        "ann_cosine_topk_pq",  # r5
        "ann_cosine_topk_ivfpq",  # r6
    }
)


# Family order for the uncertified prefix: streaming parity and window
# extensions have waited two rounds; rows-only entries sort after every
# hash-checkable oracle query (the driver's rows-only check is weaker,
# so oracle entries spend the bounded prefix better).
_FAMILY_PRIORITY = {
    "stream_parity": 0,
    "windows_ext": 1,
    "dedup": 2,
    "curation": 3,
    "curation2": 4,
    "multimodal": 5,
    "events_ext": 6,
    "text": 7,
    "text2": 8,
    "relational6": 9,
    "relational4": 10,
    "relational5": 11,
    "similarity2": 12,
    "similarity": 13,
    "ivf": 14,
    # round-6 wave 2: substring/semantic dedup, weighted sampling, CMS
    "dedup2": 15,
    "sampling": 16,
    "scale_patterns": 17,
}


# Queries whose OPERATOR CODE changed this round after their green row
# was recorded — a prior-round certification is stale the moment the
# plan it certified is rewritten, so these are forced to the very front
# of the driver's bounded prefix (ahead of never-certified queries and
# the rotation) to be re-greened against the new code. Refreshed by
# hand each round from `git diff <last-round-tag> -- beametrics_spark/`
# mapped through the registry's module->query index.
RECERTIFY: frozenset[str] = frozenset(
    {
        # round 12 (VERDICT r11 #1-#2): media paths fused to ONE Python
        # stage + batch-vectorized reductions (multimodal.py)
        "multimodal_wav_frame_rms", "multimodal_bmp_ppm_decode",
        "multimodal_image_patch_pool",
        # round 12 (VERDICT r11 #3): real sortless broadcast-cutoff
        # paths behind documented flags (mining.py
        # weighted_order_boundary_rows, text4.py order_boundary_rows),
        # window defaults kept per the measured construction-inclusive
        # crossover
        "part_revenue_abc_classes", "quality_decile_token_budget",
        # round 12 (VERDICT r11 #5): rollup -> plain groupBy(a,b) with
        # unigrams/totals derived from the persisted pair table
        # (text3.py)
        "bigram_pmi_top",
        # round 12 (VERDICT r11 #6): raw_key_counts 2P exchange shipped
        # to the planner-stats trio (profiling.py / profiling2.py)
        "key_skew_profile", "shuffle_partition_estimate",
        "join_cardinality_estimate",
    }
)


# The queries whose latest green driver row is the STALEST in the
# registry. Round-12 refresh: the r4 tier re-greened in round 11, so
# the tuple now holds the 13 queries whose latest certification is
# round 5 (computed from the union of CORRECTNESS_r01–r11 latest green
# rows). Quota 13 ⇒ the entire r5 tier re-greens this round and the
# oldest tier advances to r6 (37 rows) for round 13. Two of the 13
# (part_revenue_abc_classes, quality_decile_token_budget) are also in
# RECERTIFY — the dedup in queries() keeps each in the prefix once.
_OLDEST_CERTIFIED: tuple[str, ...] = (
    "bpe_merge_candidates", "centroid_separation_matrix", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "ngram_novelty_curve",
    "part_revenue_abc_classes", "quality_decile_token_budget",
    "stream_join_click_purchase_parity", "stream_ohlc_parity",
    "watermark_lateness_audit", "weighted_median_price_per_flag",
    "zipf_fit_slope",
)

_OLDEST_QUOTA = 13


# Pinned rotation index for the certified-block rotation (ADVICE r6 #1:
# deriving it from the count of untracked CORRECTNESS_r*.json files made
# queries() ordering environment-dependent and able to shift mid-round
# the moment the driver writes its artifact). Bumped by hand each round
# alongside the DRIVER_CERTIFIED append; SPARK_GRAFT_ROUND overrides for
# experiments.
_ROUND_INDEX = int(os.environ.get("SPARK_GRAFT_ROUND", "12"))


def _round_index() -> int:
    """Rotation counter for which certified queries re-enter the
    driver's bounded prefix this round (VERDICT r5 process caveat:
    certifications were never re-verified by the driver once certified).
    A pinned constant, not a disk probe — see _ROUND_INDEX."""
    return _ROUND_INDEX


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ M7 set).

    Ordered with queries lacking a prior-round driver CORRECTNESS row
    first (see DRIVER_CERTIFIED) so the driver's bounded per-round check
    extends cumulative certification instead of re-checking the same
    prefix every round; within the uncertified block, oracle-checkable
    entries precede rows-only ones, families per _FAMILY_PRIORITY.

    The CERTIFIED block is rotated by a deterministic per-round offset
    (43 names per round, coprime with any plausible registry size), so
    every certified query cycles back through the driver's ~50-query
    prefix about once every 4 rounds instead of riding a stale row
    forever — re-certification by the DRIVER, not just the local gate.
    """
    from beametrics_spark.registry import load_all

    items = list(load_all().items())
    # oldest-first quota: a 16-slot rotating window over the r1/r2-only
    # certified tuple, pinned ahead of the general rotation
    o_off = (_round_index() * _OLDEST_QUOTA) % len(_OLDEST_CERTIFIED)
    wrapped = _OLDEST_CERTIFIED[o_off:] + _OLDEST_CERTIFIED[:o_off]
    oldest_window = {name: i for i, name in enumerate(wrapped[:_OLDEST_QUOTA])}
    certified_sorted = sorted(n for n, _ in items if n in DRIVER_CERTIFIED)
    rot = {}
    if certified_sorted:
        off = (_round_index() * 43) % len(certified_sorted)
        rot = {
            name: i
            for i, name in enumerate(
                certified_sorted[off:] + certified_sorted[:off]
            )
        }

    def rank(kv):
        name, (fn, oracle) = kv
        family = fn.__module__.rsplit(".", 1)[-1]
        if name in RECERTIFY:
            # operator code changed after certification — re-green first
            return (-1, 0, 0, 0)
        if name in oldest_window:
            # stalest certifications: guaranteed quota right after the
            # uncertified block
            return (0, 9, 99, oldest_window[name])
        if name in ROWS_RECORDED:
            # weaker check already recorded; worst use of a prefix slot
            return (2, 0, 0, 0)
        if name in DRIVER_CERTIFIED:
            # rotation order dominates inside the certified block
            return (1, 0, rot.get(name, 0), 0)
        return (0, oracle is None, _FAMILY_PRIORITY.get(family, 99), 0)

    items.sort(key=rank)  # stable: registry order within each group
    return {name: _wrap(fn) for name, (fn, _oracle) in items}


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_configure(spark), sf_dir)

    return run


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    from beametrics_spark.registry import load_all

    return {
        name: oracle for name, (_fn, oracle) in load_all().items() if oracle is not None
    }
