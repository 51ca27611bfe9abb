#!/usr/bin/env python
"""Measure per-query shuffle volume: the scale-limiting quantity.

Wall-clock on local[32] measures this machine; SHUFFLE BYTES measure the
plan — they scale deterministically with data volume and survive host
noise. For each headline query this tool executes the plan and reports
shuffle bytes written, records shuffled, and input bytes read (from the
Spark AppStatusStore stage metrics), so "the dedup family never shuffles
text" stops being a docstring claim and becomes a recorded number: e.g.
dedup_exact at sf0.1 shuffles ~50 bytes/doc (fingerprint + id), not the
~1 KB/doc of payload.

    python tools/measure_shuffles.py [sf_dir] [query ...]

Prints one line per query: shuffle-write bytes, shuffled records, and
bytes/record — compare shuffle bytes against the fixture file sizes
(documents.parquet at sf0.1 is ~595 KB) to see which operators move a
fraction of the corpus vs a multiple of it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

DEFAULT_QUERIES = [
    "fred_silver_monthly",
    "q1_pricing_summary",
    "dedup_exact_keep_min",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_span_overlap",
    "snapshot_diff_counts",
    "curation_shuffle_assignment",
    "text_tfidf_top_terms",
    "text_topk_ngrams",
    "quality_monitor_windows",
    "similarity_cosine_topk",
    "embedding_kmeans_assign",
    "similarity_quantized_topk",
    "text_bpe_merges",
    "dedup_edit_distance",
    "decontam_embedding_hits",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "bitext_margin_pairs",
    "embedding_kcenter_coreset",
    "text_unigram_drift",
    "curation_adaptive_quality_gate",
    "manifest_change_feed",
    "bloom_pruned_join_revenue",
    "manifest_apply_changes",
    "profile_quantile_sketch",
    "manifest_zorder_range_read",
    "text_cms_heavy_hitters",
    "manifest_incremental_agg",
    "text_bm25_topk",
    "graph_pagerank_topk",
    "manifest_rebucket_read",
    "sketch_theta_set_ops",
    "session_window_events",
    "semdedup_cluster_prune",
    "manifest_scd2_history",
    "embedding_power_iteration",
    # round-11 wave-3 additions (VERDICT r11 item 7: extend the
    # shuffle evidence to the new entries)
    "events_periodogram",
    "events_seasonal_decompose",
    "privacy_k_anonymity",
    "graph_weighted_sssp",
    "fifo_lot_allocation",
    "attribution_position_based",
    "orders_littles_law",
    "similarity_rbo_quantized",
    "events_haar_wavelet",
    "part_single_source_risk",
    "manifest_erasure_audit",
    "linkage_jaro_winkler",
    "graph_kcore_peel",
    "events_seasonal_anomalies",
    "revenue_bridge_price_volume",
    # round-12 rewrites (the plans whose shuffle profile changed)
    "embedding_mutual_knn_clusters",
    "linkage_snm_clusters",
    "skyline_orders_price_date",
]


def main() -> None:
    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="measure-shuffles")
    sc = spark.sparkContext
    qs = all_queries()
    status = sc._jsc.sc().statusStore()

    def totals() -> tuple[int, int]:
        sw = rec = 0
        # Spark 4 signature: stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus) — empty filters select all stages
        it = status.stageList(
            sc._jvm.java.util.ArrayList(),
            False,
            False,
            sc._gateway.new_array(sc._jvm.double, 0),
            sc._jvm.java.util.ArrayList(),
        ).iterator()
        while it.hasNext():
            s = it.next()
            sw += s.shuffleWriteBytes()
            rec += s.shuffleWriteRecords()
        return sw, rec

    print(f"# sf_dir={SF_DIR}")
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        # baseline BEFORE plan construction: operators that eagerly
        # localCheckpoint (winnowing, minhash banding) run real jobs
        # while the DataFrame is being BUILT, and those shuffles belong
        # to the query
        b0 = totals()
        df = qs[name](spark, SF_DIR)
        # noop write, NOT count(): count() lets Catalyst prune every
        # column downstream consumers would read — a projection+window
        # query collapses to a scan-count and reports ~zero shuffle.
        # The noop sink materializes all columns, measuring the plan a
        # real consumer executes. (Stage inputBytes is NOT reported: the
        # vectorized parquet reader under-reports it wildly — a 594 KB
        # documents scan shows ~7 KB — so a shuffle:input ratio would
        # flatter every query; compare shuffle bytes against the known
        # fixture file sizes instead.)
        df.write.format("noop").mode("overwrite").save()
        b1 = totals()
        sw, rec = (b1[i] - b0[i] for i in range(2))
        per = sw / rec if rec else 0.0
        print(
            f"{name:32s} shuffle={sw:>12,}B  records={rec:>10,}  "
            f"bytes/record={per:7.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
