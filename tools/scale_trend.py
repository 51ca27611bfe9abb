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
    """argv: [points] [out_json] [reps] [entries]

    ``points`` is a comma list of ``dir:mult`` pairs (default the r13
    form ``.scale_corpus/x4:4``); each entry is timed at sf0.1 (base)
    and every point, min-of-reps, growth ratios per point. ``entries``
    (comma list) overrides ENTRIES — used by the r14 run to focus the
    16x point on the 5 heaviest + one text + one multimodal entry.
    """
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    points_arg = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo, ".scale_corpus", "x4") + ":4"
    )
    points = []
    for part in points_arg.split(","):
        d, _, m = part.rpartition(":")
        points.append((d, float(m)))
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_TREND.json"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    entries = sys.argv[4].split(",") if len(sys.argv) > 4 else ENTRIES
    base = "/root/testdata/sf0.1"

    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="scale-trend")
    qs = all_queries()
    # warm reader/codegen/python workers on every dir
    qs["q1_pricing_summary"](spark, base).collect()
    for d, _ in points:
        qs["q1_pricing_summary"](spark, d).collect()

    def timed(name: str, d: str) -> tuple[float, int]:
        best, n_rows = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            n_rows = len(qs[name](spark, d).collect())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), n_rows

    results: dict[str, dict] = {}
    for name in entries:
        row: dict = {}
        row["base_s"], row["base_rows"] = timed(name, base)
        for d, m in points:
            tag = f"x{m:g}"
            row[f"{tag}_s"], row[f"{tag}_rows"] = timed(name, d)
            row[f"growth_{tag}"] = round(
                row[f"{tag}_s"] / max(row["base_s"], 1e-9), 2
            )
        results[name] = row
        print(f"{name}: {row}")

    artifact = {
        "points": [{"dir": d, "mult": m} for d, m in points],
        "base": base,
        "reps": reps,
        "stat": "min",
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
