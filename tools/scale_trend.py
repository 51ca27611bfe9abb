#!/usr/bin/env python
"""Measure Spark-side runtime growth from sf0.1 to a synthesized
larger corpus (see make_scale_corpus.py) — the first measured evidence
above sf0.1 behind the 100 TB growth claims (VERDICT r12 item 4).

Runs each chosen entry's SPARK side only (no DuckDB oracle — the
definitional ground truths are deliberately quadratic eval harnesses)
at the base and scaled dirs, min-of-N wall clock each, and writes a
JSON artifact with per-query growth ratios.

Entry choice: the heaviest headline entries by BENCH_r12 plus the
structural representatives of each at-scale family (banded dedup,
LSH-candidate kNN, iterative CC/graph state, manifest round trips,
windowed sessionization). Sample-bounded eval entries
(dedup_lsh_recall, embedding_knn_accuracy) and the fixed-slice parity
pin (similarity_ml_minhash_pairs) are EXCLUDED by design: their cost
is pinned to a constant slice, so a growth ratio would measure the
bound, not the engine.

Usage:
    python tools/scale_trend.py [scaled_dir] [mult] [out_json] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRIES = [
    # LSH-candidate mutual kNN + CC (the single heaviest headline line)
    "embedding_mutual_knn_clusters",
    # banded near-dup dedup (the 100 TB dedup scale path)
    "dedup_minhash_lsh",
    "dedup_edit_distance",
    "dedup_ngram_components",
    # ANN index build + search
    "similarity_ivfpq_topk",
    "similarity_pq_topk",
    "similarity_ivf_topk",
    # lakehouse / manifest round trips
    "tpch_refresh_pricing",
    "manifest_incremental_minmax",
    "manifest_apply_changes",
    # iterative graph state
    "graph_personalized_pagerank",
    "graph_kcore_peel",
    # entity resolution (islands pass) + windowed sessionization
    "linkage_snm_clusters",
    "sessionize_users",
    # flagship relational aggregate (baseline: should be ~linear scan)
    "q1_pricing_summary",
]


def main() -> None:
    scaled = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_corpus",
            "x4",
        )
    )
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALE_TREND_r13.json"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    base = "/root/testdata/sf0.1"

    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="scale-trend")
    qs = all_queries()
    # warm reader/codegen/python workers on both dirs
    qs["q1_pricing_summary"](spark, base).collect()
    qs["q1_pricing_summary"](spark, scaled).collect()

    results: dict[str, dict] = {}
    for name in ENTRIES:
        row: dict = {}
        for tag, d in (("base_s", base), ("scaled_s", scaled)):
            best, n_rows = None, None
            for _ in range(reps):
                t0 = time.perf_counter()
                n_rows = len(qs[name](spark, d).collect())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            row[tag] = round(best, 3)
            row[tag.replace("_s", "_rows")] = n_rows
        row["growth"] = round(row["scaled_s"] / max(row["base_s"], 1e-9), 2)
        results[name] = row
        print(
            f"{name}: {row['base_s']} -> {row['scaled_s']} s "
            f"({row['growth']}x at {mult}x data)"
        )

    artifact = {
        "mult": mult,
        "base": base,
        "scaled": scaled,
        "reps": reps,
        "stat": "min",
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
