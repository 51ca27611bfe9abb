#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for representative
queries, with the scale-relevant plan features called out. Run from the
repo root: python tools/dump_plans.py [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# query -> what the plan must show (rendered as the section intro)
SHOWCASE = {
    "q1_pricing_summary": (
        "Scan + pushed filter + wide partial/final hash aggregate. Look for: "
        "`PushedFilters` on l_shipdate at the parquet scan, `ReadSchema` pruned "
        "to the 7 needed columns, two `HashAggregate` nodes around one Exchange."
    ),
    "q7_nation_trade_volume": (
        "6-way join with nation self-joined twice. Look for: every join a "
        "`BroadcastHashJoin` (per-side IN filters shrink supplier/customer "
        "before the fact probes), zero SortMergeJoin, fact side never "
        "shuffled before the final aggregate."
    ),
    "q10_returned_items": (
        "Returned-item revenue top-20. Look for: both fact filters pushed to "
        "the scans (l_returnflag = R, o_orderdate range), dims broadcast, "
        "`TakeOrderedAndProject` instead of a global sort."
    ),
    "topk_orders_by_price": (
        "Top-k. Look for: `TakeOrderedAndProject` — no Sort node, no full "
        "materialization."
    ),
    "asof_clicks_to_purchases": (
        "As-of join via union + ordered window — zero Join nodes. Look for: "
        "a single `Exchange hashpartitioning(user_id...)` feeding one Window."
    ),
    "interval_join_shipments": (
        "Points-in-intervals join. Look for: the point side collapsed to "
        "(distinct day, count) BEFORE the join, the exploded interval side "
        "broadcast, no BroadcastNestedLoopJoin/CartesianProduct."
    ),
    "dedup_minhash_lsh": (
        "MinHash LSH near-dup. Look for: shingle hashing via "
        "arrays_zip/xxhash64 inside WholeStageCodegen (no interpreted lambda "
        "on the hot path), 64 min-aggregates in one HashAggregate, band "
        "bucket self-join as a hash equi-join."
    ),
    "window_range_trailing_30d": (
        "Event-time RANGE frame. Look for: one Exchange on the partition key, "
        "one Window with a `RANGE BETWEEN` frame over epoch seconds."
    ),
    "q19_discounted_revenue": (
        "Disjunctive multi-attribute predicate. Look for: the OR-of-ANDs "
        "split per side and pushed into BOTH parquet scans (quantity "
        "disjunction on lineitem, brand/size disjunction on part) before "
        "the broadcast join."
    ),
    "decontam_ngram_hits": (
        "Benchmark decontamination. Look for: the benchmark shingle set on "
        "the `BroadcastExchange` side of a `BroadcastHashJoin` (BuildRight) — "
        "the corpus is probed map-side and never shuffles for the join; "
        "shingle hashing stays in WholeStageCodegen."
    ),
    "embedding_centroid_prune": (
        "Centroid pruning. Look for: the #labels-row centroid table built by "
        "partial/final aggregates then `BroadcastExchange` into a "
        "`BroadcastHashJoin` against the full embedding scan — the corpus "
        "side has zero exchanges."
    ),
    "dedup_edit_distance": (
        "PassJoin edit-distance self-join. Look for: the probe side one "
        "Generate (explode of the constant combo array) + codegen'd "
        "projection (NOT a 196-wide expression tree — that blew the 64 KB "
        "codegen limit), the candidate join a shuffled equi-join on the "
        "narrow (L, i, seg) key, levenshtein only after the distinct pair "
        "set, never per probe row."
    ),
    "similarity_quantized_topk": (
        "Compressed-index ANN. Look for: candidate scoring as "
        "posexplode -> broadcast join on the dimension index -> "
        "partial+final HashAggregate (whole-stage codegen'd integer "
        "multiply-adds), per-pair rows narrowed to 3 columns before the "
        "shortlist Window, the float vector column appearing ONLY in the "
        "post-shortlist rescore joins."
    ),
    "decontam_embedding_hits": (
        "Semantic decontamination screen. Look for: the benchmark side a "
        "BroadcastNestedLoopJoin build (eval sets are small by "
        "construction), the corpus side a single un-shuffled scan, the "
        "only Exchange carrying one narrow row per CONTAMINATED vector "
        "into the final aggregate."
    ),
    "pack_sequences_greedy": (
        "Sequence packing. Look for: exactly one "
        "`Exchange hashpartitioning(source...)` feeding one Window with the "
        "running-sum frame — per-shard packing, no global sort, no range "
        "exchange."
    ),
    "similarity_pq_topk": (
        "Product-quantization ANN (round 7). Look for: the code-table "
        "scan reading the EXPORTED parquet index (16 small codes per "
        "vector, never the float column), the per-query LUT entering as "
        "a `BroadcastHashJoin` on (m, c), HashAggregate pairs around "
        "narrow (query_id, id) exchanges for the ADC sums, and the "
        "float `embeddings` scan appearing only downstream of the "
        "refine*k WindowGroupLimit shortlist."
    ),
    "similarity_ivfpq_topk": (
        "IVF-PQ composition (round 7). Look for: the candidate build a "
        "hash equi-join of probes x assignment on `cell` (no "
        "nested-loop anywhere), the ADC join keyed (query_id, m, c) "
        "against the broadcast LUT, and the same shortlist-only float "
        "access as similarity_pq_topk — the full cell-pruned "
        "compressed-scan shape."
    ),
    "decontam_embedding_hits_lsh": (
        "LSH-bucketed semantic decontamination (round 7). Look for: NO "
        "BroadcastNestedLoopJoin (the broadcast-screen shape this "
        "replaces) — candidates come from a hash equi-join of the two "
        "exported signature tables on (t, sig), the bench hot-bucket "
        "cap as a broadcast anti-join, and exact cosine verification "
        "joining vectors onto candidate pairs only."
    ),
    "sample_weighted_aes": (
        "Weighted sampling without replacement (round 7). Look for: a "
        "single scan + projection computing the md5-derived key, one "
        "`Exchange hashpartitioning(lang...)` into the per-stratum "
        "top-n — `WindowGroupLimit` cutting to n before the full sort, "
        "no global ordering."
    ),
    "bitext_margin_pairs": (
        "Margin-based bitext mining (round 7). Look for: the pair table "
        "built as scan(side_b) x `BroadcastNestedLoopJoin` of the "
        "broadcast side_a (the ANN-injectable candidate kernel), two "
        "windowed top-k_nn neighborhood aggregates re-joined on the "
        "pair's own keys, `WindowGroupLimit` for the forward "
        "best-per-source cut — no corpus-side global sort."
    ),
    "embedding_kcenter_coreset": (
        "Greedy k-center coreset (round 7). The plan below is the "
        "exported-trace readback (the catalog entry returns the oracle-"
        "visible export); the selection itself runs k internal per-step "
        "jobs whose plans are one scan + codegen'd `least()` of "
        "broadcast-literal centroid distances + a single partial/final "
        "`max_by` aggregate — 658 shuffle BYTES total at sf0.1, k "
        "single-row collects, no Window, no join."
    ),
    "profile_quantile_sketch": (
        "DDSketch quantile profile (round 7). Look for: one scan per "
        "snapshot folding into a partial/final count aggregate on "
        "(sign, idx) log buckets, the union+re-sum merge, and the "
        "O(buckets) cumulative-sum window whose input is the sketch — "
        "never the data (the single-partition Window warning is "
        "intentional: it orders at most a few hundred bucket rows); "
        "the exact-rank certification join is the gate-only extra."
    ),
    "text_cms_heavy_hitters": (
        "Count-min heavy hitters (round 7). Look for: token explode "
        "feeding a partial/final count on (row, pos) — the shuffle "
        "carries counter coordinates, never tokens — the merge as "
        "union+re-sum, and the probe join with the <= d*w-row counter "
        "matrix on the BROADCAST side (`BroadcastHashJoin`, LeftOuter)."
    ),
    "multimodal_phash_dedup": (
        "Perceptual-hash near-dup (round 10). Look for: ONE "
        "`MapInPandas`/ArrowEvalPython stage (the DCT hash — the only "
        "Python hop), the exported hash table re-entering as a parquet "
        "scan, the banded candidate join as a hash EQUI-join on "
        "(band, bval) — no CartesianProduct, no BroadcastNestedLoopJoin "
        "on data-bearing sides — and the Hamming verify as a JVM-side "
        "bit_count(xor) filter."
    ),
    "embedding_knn_accuracy": (
        "k-NN eval harness (round 10). Look for: the test split "
        "BROADCAST against the train side (eval-on-sample — the train "
        "corpus is never shuffled for the pair compare), one "
        "`Window row_number` per query id over the rounded cosine, and "
        "the vote as a partial/final aggregate pair."
    ),
    "orders_open_backlog_daily": (
        "Event-boundary backlog (round 10). Look for: the +1/-1 union "
        "collapsing through a partial/final HashAggregate to O(days) "
        "rows BEFORE the cumulative Window — the running sum's Sort "
        "consumes the aggregate, never raw orders/lineitem."
    ),
    "winsorize_order_prices": (
        "Winsorized mean (third wave). Look for: the percentile bounds "
        "computed behind ONE `Exchange hashpartitioning` with "
        "`partial_percentile` map-side state, the O(groups) bounds frame "
        "re-entering via `BroadcastHashJoin`, and the clipped re-aggregate "
        "as a second partial/final pair — the fact table never sorts."
    ),
    "graph_triangle_topk": (
        "Degree-oriented triangle census (third wave). Look for: every "
        "join an equi `SortMergeJoin`/`BroadcastHashJoin` (no "
        "CartesianProduct anywhere), the orientation struct choosing the "
        "lower-(degree, id) endpoint, the wedge self-join keyed on the "
        "apex, the closure join on (x, y), and `TakeOrderedAndProject` "
        "for the top-20."
    ),
    "bootstrap_ci_order_prices": (
        "Poisson bootstrap CI (third wave). Look for: `partial_sum` "
        "ABOVE `Generate explode` in the tree — the 32x replication is "
        "absorbed by the map-side combiner, so the one "
        "`Exchange hashpartitioning(__rep...)` carries O(reps x "
        "partitions) sums; md5/conv weight derivation fully codegen'd."
    ),
    "embedding_gram_pca": (
        "Gram-matrix PCA projection (third wave). Look for: zero "
        "`Exchange hashpartitioning` in the projection plan — the corpus "
        "is scanned once and probed against the IdentityBroadcast of the "
        "64-row exported component table (collect_list SinglePartition "
        "is the only exchange, over 64 rows)."
    ),
    "skyline_orders_price_date": (
        "2-D skyline (round 12). Look for: the distributed sort-prune — "
        "per-partition local frontier first (a Window over "
        "`spark_partition_id`), then the global pass over the tiny "
        "survivor set; the orders scan read once, no O(n^2) self-join "
        "anywhere (the DuckDB oracle side was de-quadratified the same "
        "round via per-price-group maxima)."
    ),
    # bloom_pruned_join_revenue is deliberately not showcased: its
    # defining feature is a 2,048-element array LITERAL in the filter
    # condition (16 KB of plan text that would swamp this file); the
    # plan shape — codegen'd `*(1) Filter`, zero exchanges, no join
    # node before the real join — is pinned in tests/test_bloom.py.
    # linkage_snm_clusters / embedding_mutual_knn_clusters are not
    # showcased: their final plans read back eagerly-materialized
    # stages (exported entity index / localCheckpointed CC frames), so
    # the interesting stages never appear in the final explain — they
    # are pinned directly instead (test_plan_shapes.py:
    # test_mutual_knn_stage_has_no_theta_join; tests/test_linkage.py
    # equivalence pins for the islands pass).
}


def main() -> None:
    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    qs = all_queries()
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        f"Generated by `tools/dump_plans.py` at {SF_DIR} (`explain formatted`,",
        "AQE initial plans). Regenerate after plan-affecting changes; the",
        "load-bearing plan properties are additionally pinned as assertions in",
        "`tests/test_plan_shapes.py`, so drift fails CI rather than just",
        "staling this file.",
        "",
    ]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, blurb in SHOWCASE.items():
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", blurb, "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
