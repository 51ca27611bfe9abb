"""Named-query registry: the driver-facing queries()/oracle_sql() catalog.

Every implemented operator (SURVEY.md §2 + the LLM-data extensions) gets a
named entry: a PySpark callable ``(spark, sf_dir) -> DataFrame`` and, when
ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string. Conventions
that keep the driver's order-insensitive value-hash stable across engines:

- every computed column is aliased identically in Spark and SQL;
- double-typed aggregates are rounded in BOTH engines (sum->2dp, avg/ratio
  ->6dp) so partial-aggregation order can't leak into the hash;
- timestamps/dates are formatted to strings at the query edge;
- int-width parity: DuckDB year()/month()/len() are cast to match Spark's
  int32/int64 output types;
- top-k queries carry a unique-key tiebreak in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None -> driver runs the weaker rows-only check
    description: str = ""


def query(name: str, oracle: str | None = None, description: str = ""):
    """Decorator registering a named query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


def get_query(name: str) -> QuerySpec:
    return _REGISTRY[name]


# CATALOG_ORDER is the catalog's table of contents: a single static,
# git-tracked ordering of every registered query, grouped by family.
# The order is a one-time editorial choice per round: it depends on
# nothing outside this file (in particular, NOT on any evaluation
# artifact), so `all_queries()` is stable across rounds and
# environments. `tests/test_entry_contract.py` asserts the list and the
# registry match exactly, so adding a query without cataloguing it is a
# test failure, not a silent reorder.
#
# Editorial reslot #12 (round 15): external consumers verify a
# fixed-size prefix of this catalog (50 entries). Composition:
#   1. the 22 entries whose code changed in round 15 (each re-gated
#      locally at sf0.001 + sf0.01 + sf0.1 before this reslot, hashes
#      unchanged by construction): the checkpoint-free deterministic
#      µkey-bucket rewrite of the exact-rank primitive
#      (operators/rank.py) touching the ten ordered_prefix/exact_ntile
#      entries; the shared-silver persists + IVM internal reuse
#      (feed/state persists, operators/ivm.py) touching the nine
#      manifest/commit-log entries; and the lazy per-round checkpoint
#      cadence (operators/graph.py) touching kcore/BFS/SSSP;
#   2. the 12 stalest below-window entries (the 8 round-7 leftovers
#      skew_salted_join_revenue .. window_range_trailing_30d plus the
#      4 round-13-verified heads similarity_ml_minhash_pairs,
#      linkage_snm_clusters, events_seasonal_anomalies,
#      dedup_ngram_components) — the freshness promotion;
#   3. 16 round-14-verified continuity entries (the round-6 leftover
#      block and the r14-changed heads, alphabetical head of the rest).
# 22 + 12 + 16 = exactly 50. Everything else demotes below the window
# in its prior (reslot-#11) order. The below-window tail remains
# mirrored locally every round by tests/test_oracle_parity.py.
CATALOG_ORDER: tuple[str, ...] = (
    # ===== verified window (first 50) — editorial reslot #12 (round 15) =====
    # 1. entries whose code changed in round 15 (see header):
    "auc_doc_length_lang",
    "calibration_length_deciles",
    "curation_perplexity_buckets",
    "gini_customer_spend",
    "lorenz_customer_spend",
    "pareto_abc_parts",
    "profile_quantile_sketch",
    "spearman_quantity_price",
    "weighted_median_price",
    "window_ntile_percent_rank",
    "fred_merge_into_lake",
    "fred_merge_into_manifest",
    "fred_upsert_merge",
    "fred_vintage_revisions",
    "manifest_apply_changes",
    "manifest_change_feed",
    "manifest_incremental_agg",
    "manifest_incremental_minmax",
    "manifest_incremental_topk",
    "graph_bfs_levels",
    "graph_kcore_peel",
    "graph_weighted_sssp",
    # 2. freshness promotions (stalest below-window entries):
    "skew_salted_join_revenue",
    "stats_aggregates_lineitem",
    "stream_click_attribution",
    "string_agg_region_nations",
    "string_functions_parts",
    "text_bpe_token_counts",
    "tumbling_window_events",
    "window_range_trailing_30d",
    "similarity_ml_minhash_pairs",
    "linkage_snm_clusters",
    "events_seasonal_anomalies",
    "dedup_ngram_components",
    # 3. round-14-verified continuity entries:
    "text_compression_ratio",
    "text_langid_confusion",
    "text_tfidf_top_terms",
    "text_topk_ngrams",
    "text_vocab_coverage",
    "topk_orders_by_price",
    "union_all_lake_layers",
    "unpivot_lineitem_measures",
    "multimodal_phash_dedup",
    "text_unigram_drift",
    "embedding_mutual_knn_clusters",
    "embedding_neardup_lsh",
    "array_functions_tokens",
    "bitext_margin_pairs",
    "case_when_price_bands",
    "cast_coercion_values",
    # ===== below the window: demoted in prior (reslot-#11) order =====
    "cross_join_region_pairs",
    "curation_adaptive_quality_gate",
    "date_functions_orders",
    "decontam_embedding_hits_lsh",
    "distinct_parts_per_flag",
    "embedding_kcenter_coreset",
    "embedding_label_stats",
    "embedding_norms",
    "except_all_nation_multiset",
    "except_orders_without_items",
    "gap_fill_forward_monthly",
    "histogram_order_prices",
    "intersect_all_nation_multiset",
    "intersect_shared_nations",
    "interval_join_shipments",
    "json_extract_props",
    "null_functions_events",
    "null_safe_join_event_kinds",
    "profile_table_lineitem",
    "range_join_price_bands",
    "similarity_incremental_pq",
    "similarity_ivfpq_topk",
    "similarity_pq_topk",
    "skew_salted_agg_quantities",
    "dedup_neardup_resolve",
    "dedup_incremental_components",
    "dedup_quality_resolve",
    "dedup_edit_distance",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_prefix",
    "curation_split_leakage",
    "embedding_neardup_resolve",
    "anti_join_customers_no_recent_orders",
    "approx_aggregates_lineitem",
    "correlated_subquery_max_per_cust",
    "cube_status_priority",
    "curation_shuffle_assignment",
    "decontam_embedding_hits",
    "dedup_incremental_minhash",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_kmeans_assign",
    "embedding_outlier_zscores",
    "embedding_quantize_int8",
    "events_volume_anomaly",
    "explode_token_frequency",
    "from_json_typed_props",
    "grouping_sets_region_segment",
    "multimodal_decode_meta",
    "multimodal_feature_topk",
    "multimodal_frame_sample",
    "multimodal_resize_decode",
    "outer_join_order_counts",
    "percentile_order_prices",
    "pivot_priority_by_status",
    "profile_incremental_documents",
    "quality_monitor_windows",
    "rollup_region_nation_customers",
    "scalar_subquery_above_avg",
    "semi_join_customers_with_orders",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_ml_brp_neighbors",
    "similarity_quantized_topk",
    "snapshot_diff_counts",
    "text_bigram_logprob",
    "linkage_jaro_winkler",
    "revenue_bridge_price_volume",
    "skyline_orders_price_date",
    "asof_clicks_to_purchases",
    "cohort_weekly_retention",
    "curation_job_split_counts",
    "curation_pipeline_end_to_end",
    "curation_split_counts",
    "decontam_clean_count",
    "decontam_ngram_hits",
    "dedup_exact_keep_min",
    "dedup_groups",
    "dedup_incremental_ingest",
    "dedup_span_overlap",
    "domain_cap_filter",
    "embedding_centroid_prune",
    "embedding_label_centroids",
    "funnel_view_click_purchase",
    "multimodal_mixed_codec",
    "multimodal_png_roundtrip",
    "pack_bin_stats",
    "pack_sequences_greedy",
    "profile_documents",
    "profile_drift_documents",
    "q18_large_volume_customers",
    "q3_shipping_priority",
    "q9_product_type_profit",
    "sample_hash_deterministic",
    "sample_stratified_lang",
    "sessionize_users",
    "text_chunk_windows",
    "text_fingerprints",
    "text_gopher_flags",
    "text_language_id",
    "text_quality_metrics",
    "text_quality_score",
    "text_repetition_metrics",
    "text_token_counts",
    "text_unigram_logprob",
    "text_winnow_fingerprints",
    "text_burrows_delta",
    "graph_modularity_brands",
    "orders_open_backlog_daily",
    "orders_fulfillment_sla",
    "events_runs_test",
    "stream_dq_ingest",
    "similarity_pq_distortion",
    "price_index_fisher",
    "multimodal_audio_energy",
    "price_index_chained",
    "events_ccf_leadlag",
    "tail_index_hill_prices",
    "events_daily_peaks",
    "similarity_ivf_recall_curve",
    "market_hhi_suppliers",
    "dedup_bias_report",
    "curation_split_balance_chi2",
    "text_duplication_growth",
    "supplier_scorecard",
    "nation_trade_balance",
    "ols_price_on_size_by_brand",
    "linkage_golden_record",
    "linkage_sorted_neighborhood",
    "text_bpe_merges",
    "q5_nation_revenue",
    "events_gaps_islands",
    "supplier_ontime_wilson",
    "sample_exact_k_per_group",
    "text_tokenizer_fertility",
    "text_textrank_keywords",
    "scd2_point_in_time_features",
    "events_max_drawdown",
    "window_rolling_quantile_bands",
    "events_markov_stationary",
    "events_periodogram",
    "events_seasonal_decompose",
    "privacy_k_anonymity",
    "fifo_lot_allocation",
    "attribution_position_based",
    "orders_littles_law",
    "similarity_rbo_quantized",
    "events_haar_wavelet",
    "part_single_source_risk",
    "manifest_erasure_audit",
    "forecast_conformal_intervals",
    "chi2_priority_status",
    "cramers_v_pairs",
    "similarity_ivf_ndcg",
    "dq_uniqueness_audit",
    "embedding_centroid_drift",
    "dq_freshness_audit",
    "text_hapax_ratio",
    "events_dow_seasonality",
    "kruskal_wallis_qty_flag",
    "abtest_conversion_ztest",
    "graph_degree_assortativity",
    "graph_clustering_topk",
    "text_js_divergence_sources",
    "text_readability_scores",
    "dq_accepted_values_audit",
    "embedding_knn_accuracy",
    "curation_neyman_allocation",
    "dedup_lsh_recall",
    "curation_redact_pii",
    "embedding_hard_negatives",
    "curation_quality_report",
    "embedding_neardup_cosine",
    "similarity_cosine_topk",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipping_delay",
    "q13_customer_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_parts_supplier_relationship",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity",
    "fred_silver_monthly",
    "fred_gold_yearly",
    "fred_dedup_append",
    "q1_pricing_summary",
    "manifest_zorder_range_read",
    "stream_lake_ingest",
    "manifest_rebucket_read",
    "manifest_time_travel",
    "manifest_vacuum_read",
    "manifest_shallow_clone",
    "winsorize_order_prices",
    "anomaly_mad_outliers",
    "record_linkage_fs",
    "ks_test_doc_lengths",
    "text_entropy_by_source",
    "sketch_hll_report",
    "graph_personalized_pagerank",
    "winsorize_approx_path",
    "hybrid_rrf_retrieval",
    "window_hll_distinct_users",
    "similarity_ivf_recall",
    "curation_mixture_allocation",
    "stream_hll_ingest",
    "benford_order_prices",
    "ewma_user_values",
    "acf_event_type_daily",
    "assoc_rules_parts",
    "text_token_mi_lang",
    "dedup_containment_pairs",
    "text_zipf_slope",
    "interarrival_burstiness",
    "stream_cms_ingest",
    "survival_user_lifetime",
    "sampling_effective_size",
    "mann_kendall_trend",
    "theil_sen_trend",
    "forecast_seasonal_naive_mape",
    "source_ucb_scores",
    "embedding_silhouette_centroids",
    "text_novelty_rate",
    "markov_conditional_entropy",
    "dq_referential_integrity",
    "graph_pagerank_topk",
    "profile_psi_lengths",
    "sample_weighted_aes",
    "dedup_span_removal",
    "text_bm25_topk",
    "sketch_theta_set_ops",
    "session_window_events",
    "semdedup_cluster_prune",
    "manifest_scd2_history",
    "stream_event_dedup",
    "embedding_power_iteration",
    "multimodal_frame_dedup",
    "tpch_refresh_pricing",
    "dq_expectations_orders",
    "dq_quarantine_orders",
    "twap_user_values",
    "markov_event_transitions",
    "basket_pmi_pairs",
    "sketch_kmv_by_source",
    "sliding_window_events",
    "embedding_gram_pca",
    "graph_triangle_topk",
    "bootstrap_ci_order_prices",
    "events_changepoint_cusum",
    "text_jaccard_source_pairs",
    "events_trend_slope",
    "customer_rfm_segments",
    "manifest_zone_report",
    "graph_link_prediction",
    "events_user_ltv_decay",
    "bloom_pruned_join_revenue",
    "sample_temperature_mix",
    "window_lag_month_over_month",
    "window_rolling_mean",
    "window_cumulative_user_value",
    "window_frame_first_last",
    "window_rank_customers",
    "union_nations_of_parties",
    "text_cms_heavy_hitters",
)


def _ordered() -> list[QuerySpec]:
    """Registry specs in CATALOG_ORDER; queries not yet catalogued (a
    test failure, but never a runtime one) trail in registration order."""
    _load_all()
    pos = {n: i for i, n in enumerate(CATALOG_ORDER)}
    reg_ix = {n: i for i, n in enumerate(_REGISTRY)}
    return sorted(
        _REGISTRY.values(),
        key=lambda s: (pos.get(s.name, len(pos)), reg_ix[s.name]),
    )


def all_queries() -> dict[str, QueryFn]:
    return {s.name: s.fn for s in _ordered()}


def all_oracles() -> dict[str, str]:
    return {s.name: s.oracle for s in _ordered() if s.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every query-defining module exactly once."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        curation_queries,
        fred_queries,
        llm_queries,
        multimodal_queries,
        relational_queries,
        stats_queries,
        temporal_queries,
        similarity_queries,
        timeseries_queries,
    )

    _LOADED = True
