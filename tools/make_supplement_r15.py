#!/usr/bin/env python
"""Three-SF gate evidence for the round-15 changed entries
(CORRECTNESS_SUPPLEMENT_r15.json): run the driver-style DuckDB
comparison for every entry whose code or oracle changed this round at
sf0.001, sf0.01 AND sf0.1, recording ok/err per SF. The committed
artifact shows the reslot-#11 'changed' window section was gated at
all three scales BEFORE the driver ever saw it."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHANGED = [
    # checkpoint-free deterministic-bucket exact rank (operators/rank.py
    # r15 rewrite): every entry on the ordered_prefix/exact_ntile path
    "calibration_length_deciles",
    "lorenz_customer_spend",
    "profile_quantile_sketch",
    "pareto_abc_parts",
    "window_ntile_percent_rank",
    "auc_doc_length_lang",
    "gini_customer_spend",
    "spearman_quantity_price",
    "weighted_median_price",
    "curation_perplexity_buckets",
    # manifest / commit-log family: shared-input persists (query-level
    # _silver/li frames; library-level merge_into/apply_changes source
    # persists) — value-neutral by construction, hash-gated anyway
    "tpch_refresh_pricing",
    "manifest_incremental_agg",
    "manifest_incremental_minmax",
    "manifest_incremental_topk",
    "manifest_apply_changes",
    "fred_merge_into_manifest",
    "fred_merge_into_lake",
    "fred_upsert_merge",
    "manifest_change_feed",
    "fred_vintage_revisions",
    "manifest_scd2_history",
    "manifest_time_travel",
    "manifest_erasure_audit",
    # iterative graph family: lazy per-round checkpoint cadence
    # (operators/graph.py) — value-neutral set/integer algebra
    "graph_kcore_peel",
    "graph_bfs_levels",
    "graph_weighted_sssp",
]

if len(sys.argv) > 1:
    CHANGED = sys.argv[1:]


def main() -> None:
    from fred_economic_data_pipeline_local_spark.session import get_spark
    from tests.oracle_utils import compare_query

    spark = get_spark(app_name="supplement-r15")
    out: dict = {}
    for name in CHANGED:
        out[name] = {}
        for sf in ("0.001", "0.01", "0.1"):
            t0 = time.perf_counter()
            try:
                compare_query(spark, name, f"/root/testdata/sf{sf}")
                out[name][f"sf{sf}"] = {
                    "ok": True, "sec": round(time.perf_counter() - t0, 1)
                }
            except Exception as e:  # noqa: BLE001
                out[name][f"sf{sf}"] = {"ok": False, "err": str(e)[:300]}
            print(name, sf, out[name][f"sf{sf}"])
    with open("CORRECTNESS_SUPPLEMENT_r15.json", "w") as f:
        json.dump(out, f, indent=1)
    bad = [n for n in out if not all(v["ok"] for v in out[n].values())]
    print("failures:", bad or "none")


if __name__ == "__main__":
    main()
