#!/usr/bin/env python
"""Merge N BENCH_FULL-format artifacts into the round's definitive
stamp: per-query MIN across runs (host noise only ever adds time),
calibration probes min'd the same way, delta_vs_prev/session_tax
recomputed against the newest prior round exactly like bench.py does.

    python tools/merge_bench_stamps.py out.json run1.json run2.json ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    out_path, *run_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    base = dict(runs[0])
    queries: dict[str, float] = {}
    for r in runs:
        for q, t in r["queries"].items():
            queries[q] = min(queries.get(q, t), t)
    cal_min: dict[str, float] = {}
    for r in runs:
        for k, v in r["calibration"]["min"].items():
            cal_min[k] = min(cal_min.get(k, v), v)
    base["queries"] = queries
    base["value"] = round(sum(queries.values()), 3)
    base["calibration"] = {
        "min": cal_min,
        "runs": [r["calibration"] for r in runs],
    }
    base["stamp_runs"] = len(runs)
    prev, prev_cal = bench._prev_round_record(base["sf"])
    if prev:
        base["delta_vs_prev"] = {
            q: round(t / prev[q], 2)
            for q, t in queries.items()
            if q in prev and prev[q] > 0
        }
    if prev_cal and prev_cal.get("min"):
        ratios = [
            cal_min[k] / prev_cal["min"][k]
            for k in cal_min
            if prev_cal["min"].get(k, 0) > 0
        ]
        if ratios:
            tax = 1.0
            for r in ratios:
                tax *= r
            tax = tax ** (1.0 / len(ratios))
            base["session_tax"] = round(tax, 3)
            if "delta_vs_prev" in base:
                base["delta_vs_prev_normalized"] = {
                    q: round(d / tax, 2)
                    for q, d in base["delta_vs_prev"].items()
                }
    with open(out_path, "w") as fh:
        json.dump(base, fh, indent=1)
    print(
        f"stamp: {base['value']} s over {len(queries)} queries, "
        f"probes {cal_min}, session_tax {base.get('session_tax')}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
