"""Results must not depend on AQE being off.

Local mode pins spark.sql.adaptive.enabled=false (measured per-stage
re-planning pathology on a single JVM — see catalog.py), but the 100 TB
cluster profile runs with AQE ON (skew splitting, runtime broadcast,
partition coalescing). This suite re-runs a representative slice of the
oracle corpus — one query per physical family: wide agg, broadcast
chain, fact-fact join, window, iterative components, salted skew join —
with AQE enabled and checks the DuckDB comparison still holds, so the
correctness story is config-independent.
"""

from __future__ import annotations

import pytest

# Slow tier: this module mirrors the external driver's own DuckDB
# verification (the driver re-runs the comparison independently
# every round, and CORRECTNESS_SUPPLEMENT gates changed entries at
# three SFs). Deselected by default so the driver-invoked suite
# fits its window; run the full mirror with:  pytest -m "" tests/
pytestmark = pytest.mark.paritymirror

from .conftest import SF_DIR
from .oracle_utils import compare_query

AQE_SLICE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "interval_join_shipments",
    "window_rank_customers",
    "dedup_ngram_components",
    "skew_salted_join_revenue",
    # round-5 physical shapes: windowed top-k over a self-referential
    # aggregate pair (tf/df), full-outer narrow diff join, min_by
    # argmin under a k-row broadcast
    "text_tfidf_top_terms",
    "snapshot_diff_counts",
    "embedding_kmeans_assign",
    # round-6 physical shapes: exported-index round trip (write parquet
    # mid-query, bucket self-join on the read-back), versioned-lake
    # MERGE commit + read, code-narrowed shortlist + deferred-float
    # rescore, ML LSH hash-collision join
    "dedup_minhash_lsh",
    "fred_merge_into_lake",
    "similarity_quantized_topk",
    "similarity_ml_brp_neighbors",
    # round-7 window families (the promoted rotation block): running
    # window frames (unbounded + rowsBetween), multiset EXCEPT ALL,
    # salted skew agg, range join, sequence-explode gap fill, recursive
    # merge-table BPE recount, LSH-bucketed cross-table decontam
    "window_rolling_mean",
    "except_all_nation_multiset",
    "skew_salted_agg_quantities",
    "range_join_price_bands",
    "gap_fill_forward_monthly",
    "text_bpe_token_counts",
    "decontam_embedding_hits_lsh",
    # PQ/ADC: broadcast LUT equi-join over the compressed code table;
    # IVF-PQ adds the inverted-list candidate restriction join
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    # manifest commit log: staged bucket write + manifest-pruned read
    "fred_merge_into_manifest",
    # round-7 continuation shapes: manifest-diff change feed consumed
    # through a second table's atomic replay commits; literal-bitmask
    # map-side Bloom prune ahead of the join exchange; O(buckets)
    # sketch walk + broadcast rank certification
    "manifest_apply_changes",
    "bloom_pruned_join_revenue",
    "profile_quantile_sketch",
    # zorder rewrite (range-partition sample-sort + manifest-pruned
    # range read), streaming foreachBatch MERGE loop, CMS broadcast
    # probe join, delta-rule aggregate maintenance
    "manifest_zorder_range_read",
    "stream_lake_ingest",
    "text_cms_heavy_hitters",
    "manifest_incremental_agg",
    # round-8 continuation shapes: inverted-index scoring with broadcast
    # stats, 5-round iterative rank exchange with checkpointed lineage,
    # one-exchange bucket-count rewrite + zone-map range read, KMV
    # TakeOrdered caps + shared-theta intersect join, native
    # session-window exec, cluster-bounded pair prune, change-feed
    # event-stream window, iterative broadcast matvec
    "text_bm25_topk",
    "graph_pagerank_topk",
    "manifest_rebucket_read",
    "sketch_theta_set_ops",
    "session_window_events",
    "semdedup_cluster_prune",
    "manifest_scd2_history",
    "embedding_power_iteration",
    # third continuation wave: exact-percentile bounds broadcast-back,
    # double-median MAD rounds, native sliding-window expand, blocked
    # FS pair scoring, Arrow-batched Gram + broadcast projection,
    # multi-version manifest snapshot union
    "winsorize_order_prices",
    "anomaly_mad_outliers",
    "sliding_window_events",
    "record_linkage_fs",
    "embedding_gram_pca",
    "manifest_time_travel",
    # batch 2: degree-oriented wedge joins, md5-Poisson explode-combine,
    # bounded-support ECDF window, vocabulary entropy re-aggregate
    "graph_triangle_topk",
    "bootstrap_ci_order_prices",
    "ks_test_doc_lengths",
    "text_entropy_by_source",
    # batch 3: retention read-back, prefix-sum/running-min CUSUM
    # windows, token-postings pair join
    "manifest_vacuum_read",
    "events_changepoint_cusum",
    "text_jaccard_source_pairs",
    "events_trend_slope",
    "manifest_shallow_clone",
    "customer_rfm_segments",
    "pareto_abc_parts",
    "manifest_zone_report",
    "graph_link_prediction",
    "events_user_ltv_decay",
]


@pytest.fixture()
def aqe_spark(spark, monkeypatch):
    # SPARK_GRAFT_AQE makes catalog.tune_session honor the override, so
    # AQE stays ON even through the query builder's load_table path —
    # without it, eagerly-executing builders (neardup_components'
    # localCheckpoint rounds) would run under the local-mode pin and the
    # check would be vacuous for exactly the iterative family it names
    monkeypatch.setenv("SPARK_GRAFT_AQE", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", "false")


@pytest.mark.parametrize("name", AQE_SLICE)
def test_oracle_parity_with_aqe_enabled(aqe_spark, name):
    compare_query(
        aqe_spark,
        name,
        SF_DIR,
        conf_overrides={"spark.sql.adaptive.enabled": "true"},
    )
    assert aqe_spark.conf.get("spark.sql.adaptive.enabled") == "true"
