#!/usr/bin/env python
"""Dump `.explain('formatted')` for the round-15 touched queries into
plans/r15/<query>_<tag>.txt (tag = before|after). Run once from an
r14-stamp worktree with tag=before, once from HEAD with tag=after:

    python tools/dump_r15_plans.py after [outdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # rank-primitive family (operators/rank.py rewrite)
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
    # manifest / commit-log family (shared-input persists)
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
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r15",
        )
    )
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name=f"dump-r15-{tag}")
    qs = all_queries()
    for name in QUERIES:
        df = qs[name](spark, sf)
        plan = (
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
